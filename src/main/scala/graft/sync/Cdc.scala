package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC changelog compaction — materialize the latest state of a table from
  * an out-of-order insert/update/delete event log.
  *
  * The reference applies its diff to the target as per-row DML
  * (syncquill.py:78-107: INSERT / UPDATE / DELETE statements executed in
  * sequence). That shape assumes the changelog is REPLAYED in order against
  * a mutable store. At 100 TB the store is immutable parquet and the
  * changelog arrives out of order from many producers, so the scalable
  * re-expression is a single keyed aggregation: for each key keep the
  * highest-sequence change (`max_by`), then drop keys whose latest op is a
  * delete. One hash aggregate = one shuffle on the key, with map-side
  * partial `max_by` state (16 bytes + the row) — no window, no sort, and
  * replay order is irrelevant by construction. Contrast with the
  * row_number()-over-(key ORDER BY seq DESC) formulation, which shuffles
  * every changelog row and sorts each partition; `max_by` folds duplicates
  * before the exchange.
  */
object Cdc {

  /** Deterministic changelog derived from `orders` (same fixture pattern
    * as [[Snapshots]] — the harness has no real changelog, so one is
    * synthesized with key-driven ops, mirrored verbatim in the oracle):
    *   seq 1  INSERT every key (original price/status)
    *   seq 2  UPDATE keys ≡0 (mod 5): price +100.00, status 'U'
    *   seq 3  DELETE keys ≡0 (mod 13)
    *   seq 4  UPDATE keys ≡3 (mod 17): price +7.50 (late update AFTER a
    *          delete wave — keys hit by both 3 and 4 must resurrect)
    * The union deliberately appends deletes before the seq-4 updates so
    * the input physically arrives out of order. */
  def changelog(orders: DataFrame): DataFrame = {
    // price stays double until the final per-branch decimal(18,2) cast —
    // the exact Snapshots idiom the oracle mirrors (double arithmetic,
    // one rounding point per value, identical in both engines)
    val base = orders.select(
      col("o_orderkey").as("key"),
      col("o_totalprice").as("price"),
      col("o_orderstatus").as("status"))
    val ins = base.select(col("key"), lit(1L).as("seq"), lit("I").as("op"),
      col("price").cast("decimal(18,2)").as("price"), col("status"))
    val upd = base.filter(col("key") % 5 === 0)
      .select(col("key"), lit(2L).as("seq"), lit("U").as("op"),
        (col("price") + 100.0).cast("decimal(18,2)").as("price"), lit("U").as("status"))
    val del = base.filter(col("key") % 13 === 0)
      .select(col("key"), lit(3L).as("seq"), lit("D").as("op"),
        lit(null).cast("decimal(18,2)").as("price"), lit(null).cast("string").as("status"))
    val lateUpd = base.filter(col("key") % 17 === 3)
      .select(col("key"), lit(4L).as("seq"), lit("U").as("op"),
        (col("price") + 7.50).cast("decimal(18,2)").as("price"), lit("L").as("status"))
    ins.unionByName(upd).unionByName(del).unionByName(lateUpd)
  }

  /** Unfiltered compaction: one row per key INCLUDING delete tombstones
    * (last_op = 'D') — the state a streaming CDC maintainer holds; the
    * batch materialization drops tombstones on top of this. */
  def compactAll(changelog: DataFrame): DataFrame =
    changelog
      .groupBy("key")
      .agg(
        max_by(col("op"), col("seq")).as("last_op"),
        max_by(col("price"), col("seq")).as("price"),
        max_by(col("status"), col("seq")).as("status"),
        max(col("seq")).as("last_seq"),
        count(lit(1)).as("n_changes"))

  /** Compact a changelog of (key, seq, op, price, status) to latest state.
    * Output: one row per surviving key with its latest values plus the
    * change count — the audit column a sync job reports. */
  def apply(changelog: DataFrame): DataFrame =
    compactAll(changelog)
      .filter(col("last_op") =!= "D")
      .select("key", "price", "status", "last_seq", "n_changes")
      .orderBy("key")

  /** The registered operator: synthesize the changelog, compact it. */
  def cdcApply(orders: DataFrame): DataFrame = apply(changelog(orders))
}
