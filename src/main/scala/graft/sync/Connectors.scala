package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Connector seam for the sync verbs: the reference speaks Google Sheets
  * API v4 on the read side (syncquill.py:60-76, `values().get` → header
  * row + all-string cells) and BigQuery on the write side
  * (syncquill.py:78-107 DML; syncquill.py:131-146 WRITE_TRUNCATE load).
  * The engine's harness stand-in is parquet on both sides — these traits
  * make that a constructor choice instead of a hardcoded
  * `spark.read.parquet`, so a Sheets/BQ (or JDBC, Delta, Iceberg…)
  * connector plugs in without touching the pipeline logic.
  *
  * Contract notes for future connectors:
  *  - [[SyncSource.read]] returns the FULL source snapshot as a
  *    DataFrame; a Sheets impl would fetch the value range, take row 1
  *    as the schema (all-string, like the reference at syncquill.py:64),
  *    and parallelize the rest.
  *  - [[SyncTarget.merge]] receives the already-computed NEW snapshot
  *    (old + changeset, set-based) and must publish it atomically-enough
  *    for the store: parquet stages to `path + ".next"` then promotes by
  *    rename; a BQ impl would instead translate the changeset to batched
  *    DML or a MERGE statement — which is why the changeset rows ride
  *    along: per-op DML needs them, snapshot stores ignore them.
  */
trait SyncSource {
  def read(spark: SparkSession): DataFrame
}

trait SyncTarget {
  /** Current target table contents (diff baseline). */
  def read(spark: SparkSession): DataFrame

  /** Publish `merged` (the post-changeset snapshot) over the target.
    * `changes` is the keyed changeset that produced it, for connectors
    * that apply deltas (BQ DML) rather than overwrite snapshots. */
  def merge(spark: SparkSession, merged: DataFrame, changes: DataFrame, key: String): Unit

  /** R11 truncate-and-load: replace the whole table with `snapshot`. */
  def truncateLoad(snapshot: DataFrame): Unit
}

private object Promote {
  /** Stage-then-promote publish shared by snapshot targets: the write job
    * completes into `path + ".next"` BEFORE the target is touched, so the
    * non-atomic delete+rename window holds only directory moves, never a
    * partially-written table. */
  def over(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    val staging = path + ".next"
    write(staging)
    val tgt = new org.apache.hadoop.fs.Path(path)
    val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tgt, true)
    require(fs.rename(new org.apache.hadoop.fs.Path(staging), tgt),
      s"failed to promote $staging over $path")
  }
}

/** Parquet snapshot source — the harness stand-in for the Sheets reader. */
final case class ParquetSource(path: String) extends SyncSource {
  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** Parquet snapshot target: merge = stage-then-promote. */
final case class ParquetTarget(path: String) extends SyncTarget {
  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)

  def merge(spark: SparkSession, merged: DataFrame, changes: DataFrame, key: String): Unit =
    Promote.over(spark, path)(Sinks.truncateLoad(merged, _))

  def truncateLoad(snapshot: DataFrame): Unit =
    Sinks.truncateLoad(snapshot, path)
}

/** All-string CSV source — the FAITHFUL analog of the reference's Sheets
  * reader: row 1 is the header/schema and every cell is a string
  * (syncquill.py:61-65; README.md "auto detect schema" happens at the
  * TARGET, not the reader). No inferSchema on purpose: the reference's
  * comparison domain is strings, and type canonicalization is an engine
  * operator (`project_cast_string`), not a reader side effect. */
final case class CsvSource(path: String) extends SyncSource {
  def read(spark: SparkSession): DataFrame =
    spark.read.option("header", "true").csv(path)
}

/** CSV snapshot target (all-string, header row), publishing via the same
  * stage-then-promote as parquet. Demonstrates that source and target
  * kinds compose independently through the seam. */
final case class CsvTarget(path: String) extends SyncTarget {
  def read(spark: SparkSession): DataFrame =
    spark.read.option("header", "true").csv(path)

  private def writeCsv(df: DataFrame, out: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(out)

  def merge(spark: SparkSession, merged: DataFrame, changes: DataFrame, key: String): Unit =
    Promote.over(spark, path)(writeCsv(merged, _))

  def truncateLoad(snapshot: DataFrame): Unit =
    writeCsv(snapshot, path)
}
