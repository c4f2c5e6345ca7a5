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
}
