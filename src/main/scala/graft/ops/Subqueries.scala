package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery surface via `spark.sql` — Catalyst decorrelates these into
  * joins (`RewriteCorrelatedScalarSubquery`, `RewritePredicateSubquery`),
  * so what executes is a plain aggregate + join plan, not a per-row
  * subquery evaluation (the difference between O(n) and O(n²) at scale).
  */
object Subqueries {

  /** Correlated scalar subquery: customers above their own nation's
    * average balance → decorrelates to agg-then-join. */
  def scalarCorrelated(spark: SparkSession, customer: DataFrame): DataFrame = {
    customer.createOrReplaceTempView("customer_v")
    // exact-decimal mean (Det doctrine): a double AVG is shuffle-order
    // dependent and could flip boundary rows between engines
    spark.sql(
      """SELECT c_custkey, c_nationkey, c_acctbal
        |FROM customer_v o
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(i.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |                   FROM customer_v i WHERE i.c_nationkey = o.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** NOT IN with nullable subquery values — the classic three-valued-
    * logic trap: one NULL in the subquery makes `x NOT IN (...)` UNKNOWN
    * for every x, so the result is EMPTY, not "everything unmatched".
    * Spark plans a null-aware anti join for this (not a plain left_anti
    * — which would silently return the wrong, non-empty answer). Both
    * variants emitted side by side so the gap is visible and checked. */
  def notInNullAware(spark: SparkSession, customer: DataFrame, orders: DataFrame): DataFrame = {
    customer.createOrReplaceTempView("customer_v")
    orders.createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT 'clean_subquery' AS variant, count(*) AS n_rows
        |FROM customer_v
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders_v WHERE o_totalprice > 300000 AND o_custkey IS NOT NULL)
        |UNION ALL
        |SELECT 'null_in_subquery', count(*)
        |FROM customer_v
        |WHERE c_custkey NOT IN
        |  (SELECT CASE WHEN o_orderkey % 1000 = 7 THEN NULL ELSE o_custkey END
        |   FROM orders_v WHERE o_totalprice > 300000)
        |ORDER BY variant""".stripMargin)
  }

  /** IN-subquery → left-semi join after RewritePredicateSubquery. */
  def inSubquery(spark: SparkSession, customer: DataFrame, orders: DataFrame): DataFrame = {
    customer.createOrReplaceTempView("customer_v")
    orders.createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT c_custkey, c_name
        |FROM customer_v
        |WHERE c_custkey IN (SELECT o_custkey FROM orders_v WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** LATERAL join: per customer, the top-2 orders by value — the
    * correlated-subquery-in-FROM form (SQL:1999 LATERAL; Spark 3.2+).
    * Catalyst decorrelates the ORDER BY/LIMIT into a partitioned
    * row_number filter, so what executes is one equi-join + window, not a
    * per-row subquery — the same plan a hand-written top-k-per-group
    * query gets, at any scale. Restricted to BUILDING customers so the
    * output stays reporting-sized. */
  def lateralTopN(spark: SparkSession, customer: DataFrame, orders: DataFrame): DataFrame = {
    customer.createOrReplaceTempView("customer_v")
    orders.createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer_v c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders_v
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey, o_orderkey""".stripMargin)
  }
}
