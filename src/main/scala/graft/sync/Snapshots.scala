package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic old/new snapshot fixtures derived from `customer`.
  *
  * The harness has no second copy of any table, so the "sheet" and "BQ"
  * sides of the sync are derived from `customer` with key-driven
  * perturbations (updates, deletes, inserts), in the reference's string
  * value domain (syncquill.py:110-113: everything compared as str; numeric
  * cells via fixed-scale decimal so both engines render identical text).
  * The same derivations are mirrored verbatim in the oracle SQL.
  */
object Snapshots {

  /** The drift-monitor pair's "new" ORDERS snapshot (dq_drift_psi /
    * dq_drift_ks and their tests share this one derivation so the
    * registry, oracle and specs can never drift apart): drop keys
    * ≡0 (mod 43), bump o_totalprice by 500.00 for keys ≡0 (mod 7).
    * Mirrored verbatim in both drift oracles. */
  def perturbedOrders(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_orderkey") % 43 =!= 0)
      .withColumn("o_totalprice", col("o_totalprice") +
        when(col("o_orderkey") % 7 === 0, lit(500.0)).otherwise(lit(0.0)))

  /** Canonical string-domain snapshot: (slno, name, acctbal, segment). */
  def oldSnapshot(customer: DataFrame): DataFrame =
    customer
      .filter(col("c_custkey") % 50 =!= 49)
      .select(
        col("c_custkey").as("slno"),
        col("c_name").as("name"),
        col("c_acctbal").cast("decimal(18,2)").cast("string").as("acctbal"),
        col("c_mktsegment").as("segment"))

  /** Perturbed snapshot: drops keys ≡0 (mod 43), bumps acctbal for keys
    * ≡0 (mod 7), rewrites segment for keys ≡0 (mod 11). Keys dropped from
    * the OLD side (≡49 mod 50) reappear here → inserts. */
  def newSnapshot(customer: DataFrame): DataFrame =
    customer
      .filter(col("c_custkey") % 43 =!= 0)
      .select(
        col("c_custkey").as("slno"),
        col("c_name").as("name"),
        (col("c_acctbal") + when(col("c_custkey") % 7 === 0, 100.0).otherwise(0.0))
          .cast("decimal(18,2)").cast("string").as("acctbal"),
        when(col("c_custkey") % 11 === 0, lit("CHANGED"))
          .otherwise(col("c_mktsegment")).as("segment"))

  /** Positional "sheet" side: mid-snapshot drops (≡55 mod 100) plus the
    * same cell perturbations — exercises the reference's cascading
    * positional mis-diff and the del_row tail. */
  def sheetSnapshot(customer: DataFrame): DataFrame =
    customer
      .filter(col("c_custkey") % 100 =!= 55)
      .select(
        col("c_custkey").as("slno"),
        col("c_name").as("name"),
        (col("c_acctbal") + when(col("c_custkey") % 7 === 0, 100.0).otherwise(0.0))
          .cast("decimal(18,2)").cast("string").as("acctbal"),
        when(col("c_custkey") % 11 === 0, lit("CHANGED"))
          .otherwise(col("c_mktsegment")).as("segment"))

  /** Full (undropped) string-domain snapshot — positional list1 / BQ side. */
  def bqSnapshot(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey").as("slno"),
      col("c_name").as("name"),
      col("c_acctbal").cast("decimal(18,2)").cast("string").as("acctbal"),
      col("c_mktsegment").as("segment"))

  /** Shared oracle-SQL CTE bodies (DuckDB dialect) mirroring the above —
    * single source of truth for every diff-family oracle. */
  val oldSql: String =
    """SELECT c_custkey AS slno, c_name AS name,
      | CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS acctbal,
      | c_mktsegment AS segment
      |FROM customer WHERE c_custkey % 50 <> 49""".stripMargin

  val newSql: String =
    """SELECT c_custkey AS slno, c_name AS name,
      | CAST(CAST(c_acctbal + CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END AS DECIMAL(18,2)) AS VARCHAR) AS acctbal,
      | CASE WHEN c_custkey % 11 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS segment
      |FROM customer WHERE c_custkey % 43 <> 0""".stripMargin

  val sheetSql: String =
    """SELECT c_custkey AS slno, c_name AS name,
      | CAST(CAST(c_acctbal + CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END AS DECIMAL(18,2)) AS VARCHAR) AS acctbal,
      | CASE WHEN c_custkey % 11 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS segment
      |FROM customer WHERE c_custkey % 100 <> 55""".stripMargin

  val bqSql: String =
    """SELECT c_custkey AS slno, c_name AS name,
      | CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS acctbal,
      | c_mktsegment AS segment
      |FROM customer""".stripMargin

  /** "Ours" branch for the THREE-WAY merge (base = [[oldSnapshot]]):
    * drops keys ≡0 (mod 21), bumps acctbal +100 for ≡0 (mod 7),
    * rewrites segment for ≡0 (mod 11), upper-cases name for ≡0
    * (mod 13). The moduli are chosen against [[theirsSnapshot]]'s so
    * every merge class is populated at sf0.01 (same-column conflicts
    * at lcm(7,5)=35 and 22; cross-column merges at 55; equal changes
    * at 13; delete-vs-modify at 105/297; double deletes at 189;
    * one-sided inserts at 399/999 via the base's mod-50 hole). */
  def oursSnapshot(customer: DataFrame): DataFrame =
    customer
      .filter(col("c_custkey") % 21 =!= 0)
      .select(
        col("c_custkey").as("slno"),
        when(col("c_custkey") % 13 === 0, upper(col("c_name")))
          .otherwise(col("c_name")).as("name"),
        (col("c_acctbal") + when(col("c_custkey") % 7 === 0, 100.0).otherwise(0.0))
          .cast("decimal(18,2)").cast("string").as("acctbal"),
        when(col("c_custkey") % 11 === 0, lit("OURS-SEG"))
          .otherwise(col("c_mktsegment")).as("segment"))

  /** "Theirs" branch for the three-way merge: drops keys ≡0 (mod 27),
    * bumps acctbal +50 for ≡0 (mod 5), rewrites segment for ≡0
    * (mod 22 — a subset of ours' mod-11 class, so every such key is a
    * same-column conflict), upper-cases name for ≡0 (mod 13 — the
    * SAME change as ours, the convergent-edit class). */
  def theirsSnapshot(customer: DataFrame): DataFrame =
    customer
      .filter(col("c_custkey") % 27 =!= 0)
      .select(
        col("c_custkey").as("slno"),
        when(col("c_custkey") % 13 === 0, upper(col("c_name")))
          .otherwise(col("c_name")).as("name"),
        (col("c_acctbal") + when(col("c_custkey") % 5 === 0, 50.0).otherwise(0.0))
          .cast("decimal(18,2)").cast("string").as("acctbal"),
        when(col("c_custkey") % 22 === 0, lit("THEIRS-SEG"))
          .otherwise(col("c_mktsegment")).as("segment"))

  val oursSql: String =
    """SELECT c_custkey AS slno,
      | CASE WHEN c_custkey % 13 = 0 THEN upper(c_name) ELSE c_name END AS name,
      | CAST(CAST(c_acctbal + CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END AS DECIMAL(18,2)) AS VARCHAR) AS acctbal,
      | CASE WHEN c_custkey % 11 = 0 THEN 'OURS-SEG' ELSE c_mktsegment END AS segment
      |FROM customer WHERE c_custkey % 21 <> 0""".stripMargin

  val theirsSql: String =
    """SELECT c_custkey AS slno,
      | CASE WHEN c_custkey % 13 = 0 THEN upper(c_name) ELSE c_name END AS name,
      | CAST(CAST(c_acctbal + CASE WHEN c_custkey % 5 = 0 THEN 50.0 ELSE 0.0 END AS DECIMAL(18,2)) AS VARCHAR) AS acctbal,
      | CASE WHEN c_custkey % 22 = 0 THEN 'THEIRS-SEG' ELSE c_mktsegment END AS segment
      |FROM customer WHERE c_custkey % 27 <> 0""".stripMargin
}
