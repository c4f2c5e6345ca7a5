package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators — the janitorial pass a 100 TB pipeline
  * schedules continuously: streaming sinks and per-batch appends produce
  * thousands of KB-sized files whose open/footer costs eventually
  * dominate scans (the "small-files problem"); compaction rewrites them
  * into target-sized files. Data content is untouched — the oracle
  * checks the compacted table equals the source — while the file-count
  * invariant is asserted in MaintenanceSpec.
  */
object Maintenance {

  private def warehouseDir(spark: SparkSession, name: String, tag: String): String =
    spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") +
      s"/${name}_" + tag.replaceAll("[^A-Za-z0-9]", "_")

  /** Simulate a fragmented table (the state appends leave behind), then
    * compact it. Returns (fragmentedPath, compactedPath). Idempotent per
    * source path. */
  def compactEvents(spark: SparkSession, events: DataFrame,
                    fragments: Int = 64, targetFiles: Int = 4): (String, String) = {
    val tag = events.inputFiles.headOption.getOrElse("mem")
    val frag = warehouseDir(spark, "events_frag", tag)
    val comp = warehouseDir(spark, "events_compact", tag)
    val fs = new org.apache.hadoop.fs.Path(frag)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(frag))) {
      events.repartition(fragments).write.mode("overwrite").parquet(frag)
    }
    if (!fs.exists(new org.apache.hadoop.fs.Path(comp))) {
      // compaction = read small files, write few large ones. repartition
      // (not coalesce): coalesce chains the upstream parallelism to the
      // target count; a real compactor also range-sorts here so min/max
      // row-group stats prune later scans
      spark.read.parquet(frag)
        .repartitionByRange(targetFiles, col("event_id"))
        .sortWithinPartitions("event_id")
        .write.mode("overwrite").parquet(comp)
    }
    (frag, comp)
  }

  /** The compacted table, content-identical to the source (oracle-checked:
    * compaction must never change data). */
  def compactedEvents(spark: SparkSession, events: DataFrame): DataFrame = {
    val (_, comp) = compactEvents(spark, events)
    spark.read.parquet(comp)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("decimal(18,2)").cast("double").as("value"))
      .orderBy("event_id")
  }

  /** Parquet file count under a path (maintenance metric). */
  def parquetFileCount(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
  }
}
