package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorts, limits, top-k and set operations.
  *
  * The reference's only ordering is a client-side full sort of the BQ
  * snapshot (syncquill.py:46); here sorts are distributed range-partitioned
  * sorts, and sort+limit collapses to TakeOrderedAndProject (per-partition
  * top-k, then k-way merge on the driver — no global sort at all).
  * Its row-level add/delete detection (syncquill.py:117-123) is the EXCEPT
  * family re-expressed set-based.
  */
object SetSort {

  /** Multi-key sort with explicit null ordering (R5 generalized). Nulls
    * are injected deterministically — the clean data has none. */
  def multiKeySort(customer: DataFrame): DataFrame =
    customer
      .select(
        when(col("c_custkey") % 13 === 0, lit(null)).otherwise(col("c_mktsegment")).as("segment"),
        col("c_acctbal"), col("c_custkey"))
      .orderBy(col("segment").asc_nulls_first, col("c_acctbal").desc, col("c_custkey").asc)

  /** Global top-k: planner emits TakeOrderedAndProject — each partition
    * keeps k rows, driver merges. O(k) memory regardless of input size. */
  def topK(orders: DataFrame, k: Int = 100): DataFrame =
    orders
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)

  private def buildingCusts(customer: DataFrame): DataFrame =
    customer.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
  private def urgentCusts(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("k"))

  /** unionByName with missing columns — schema-evolution-tolerant union
    * (new snapshot adds a column; old rows fill with null). */
  def unionByNameMissing(customer: DataFrame): DataFrame = {
    val oldCols = customer.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
    val newCols = customer.filter(col("c_custkey") % 2 === 1)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"),
        col("c_mktsegment").as("segment"))
    oldCols.unionByName(newCols, allowMissingColumns = true).orderBy("k")
  }

  /** UNION (distinct). */
  def unionDistinct(customer: DataFrame, orders: DataFrame): DataFrame =
    buildingCusts(customer).union(urgentCusts(orders)).distinct().orderBy("k")

  /** INTERSECT. */
  def intersectKeys(customer: DataFrame, orders: DataFrame): DataFrame =
    buildingCusts(customer).intersect(urgentCusts(orders)).orderBy("k")

  /** EXCEPT — the set-based primitive behind row-level snapshot diff. */
  def exceptKeys(customer: DataFrame, orders: DataFrame): DataFrame =
    buildingCusts(customer).except(urgentCusts(orders)).orderBy("k")

  private def bagA(customer: DataFrame): DataFrame =
    customer.filter(col("c_custkey") % 3 === 0).select(col("c_mktsegment").as("segment"))
  private def bagB(customer: DataFrame): DataFrame =
    customer.filter(col("c_custkey") % 4 === 0).select(col("c_mktsegment").as("segment"))

  /** EXCEPT ALL — MULTISET difference: each segment value survives
    * `max(count_A - count_B, 0)` times (plain EXCEPT would collapse to
    * distinct values). Planned as a hash-partitioned aggregation of
    * per-side counts, not a row-by-row scan — one shuffle per side at any
    * scale. Duplicate output rows are identical, so the segment sort is
    * still a total order for the hash compare. */
  def exceptAllBags(customer: DataFrame): DataFrame =
    bagA(customer).exceptAll(bagB(customer)).orderBy("segment")

  /** INTERSECT ALL — multiset intersection: `min(count_A, count_B)`
    * copies per value. Same scale shape as [[exceptAllBags]]. */
  def intersectAllBags(customer: DataFrame): DataFrame =
    bagA(customer).intersectAll(bagB(customer)).orderBy("segment")
}
