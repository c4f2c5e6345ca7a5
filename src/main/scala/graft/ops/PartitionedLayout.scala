package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned table layout — the 100 TB at-rest story: facts written
  * `partitionBy(date)` so every time-bounded query prunes whole
  * directories before a single byte is read (`PartitionFilters` +
  * pruned file count asserted in PlanAuditSpec).
  */
object PartitionedLayout {

  private def dir(spark: SparkSession): String =
    spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:") + "/events_by_day"

  /** One-time ingest: events re-laid-out hive-style by event date. */
  def ensurePartitionedEvents(spark: SparkSession, events: DataFrame): String = {
    val path = dir(spark)
    if (!new java.io.File(path).exists()) {
      events
        .withColumn("event_date", to_date(col("ts")))
        .write.partitionBy("event_date").mode("overwrite").parquet(path)
    }
    path
  }

  /** Time-bounded scan over the partitioned layout: the date predicate
    * becomes a PartitionFilter — directories outside the range are never
    * opened. Result is oracle-checked against the unpartitioned table. */
  def prunedDailyCounts(spark: SparkSession, events: DataFrame,
                        from: String, to: String): DataFrame = {
    val path = ensurePartitionedEvents(spark, events)
    spark.read.parquet(path)
      .filter(col("event_date").between(lit(from), lit(to)))
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("event_date", "event_type")
  }
}
