package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** User-defined function surface: scalar UDF registration, a typed
  * Aggregator (UDAF), and the table-generating (UDTF) path.
  *
  * Performance doctrine (SURVEY §2C): a registered UDF is an opaque,
  * non-codegen'd call — fine as an API demonstration, but the hot path
  * should use built-ins (the scalar query here computes the same
  * normalization twice: once through the UDF to prove registration works,
  * once through codegen'd built-ins used for the returned columns).
  */
object Udfs {

  /** R6-style cell canonicalization: trim + lowercase + empty→null. */
  val normalizeCell: String => String = s =>
    if (s == null) null else { val t = s.trim.toLowerCase(java.util.Locale.ROOT); if (t.isEmpty) null else t }

  /** Scalar UDF demonstration on `part`: register `norm_cell`, apply it,
    * and assert-by-construction equality with the built-in formulation
    * (both columns emitted; the oracle checks both). */
  def scalarNorm(spark: SparkSession, part: DataFrame): DataFrame = {
    spark.udf.register("norm_cell", normalizeCell)
    part
      .select(
        col("p_partkey"),
        call_udf("norm_cell", concat(lit("  "), col("p_type"), lit("  "))).as("norm_udf"),
        nullif(lower(trim(concat(lit("  "), col("p_type"), lit("  ")))), lit("")).as("norm_builtin"))
      .orderBy("p_partkey")
  }

  /** Typed Aggregator: exact sum of squares of a fixed-point (cents)
    * column. The buffer is a Long — associative, order-independent,
    * overflow-safe to ~9e18 (1e12 per row × 1e6 rows) — so the partial
    * aggregation order can't change the result (SURVEY §7 determinism). */
  object SumSquaresCents extends Aggregator[Long, Long, Double] {
    def zero: Long = 0L
    def reduce(b: Long, cents: Long): Long = b + cents * cents
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(b: Long): Double = b / 10000.0
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** UDAF via functions.udaf: per-segment exact sum of squared balances. */
  def typedUdaf(spark: SparkSession, customer: DataFrame): DataFrame = {
    val ssq = udaf(SumSquaresCents)
    customer
      .withColumn("bal_cents", round(col("c_acctbal") * 100).cast("long"))
      .groupBy(col("c_mktsegment"))
      .agg(
        ssq(col("bal_cents")).as("sum_sq_bal"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }

  /** Table-generating path: one output row per (token, position) —
    * `posexplode` is Spark's native Generator; a custom Generator
    * expression would only be needed for semantics explode can't express. */
  def tokenGenerator(documents: DataFrame): DataFrame =
    documents
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("pos", "pos").withColumnRenamed("col", "token")
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
      .orderBy("doc_id", "pos")
}
