package graft.sync

import org.apache.spark.sql.DataFrame

/** Write paths — the Spark re-expression of the reference's three sinks:
  *
  *  - append (R9, syncquill.py:90-99: one WRITE_APPEND load job for all
  *    inserted rows),
  *  - truncate-and-load (R11, syncquill.py:131-146: WRITE_TRUNCATE +
  *    autodetect), and
  *  - the merge write that replaces R8/R10's per-cell UPDATE / per-row
  *    DELETE round-trips: compute the new snapshot set-based
  *    (SnapshotDiff.applyChangeset) and overwrite once.
  *
  * All distributed parquet jobs; at scale add partitioning columns
  * (`partitionBy`) so downstream scans prune.
  */
object Sinks {

  /** R9: append rows to a parquet table. */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** R11: truncate-and-load — full overwrite, schema from the DataFrame
    * (the engine's typed answer to BigQuery `autodetect`). */
  def truncateLoad(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Merge write: old snapshot + changeset → new snapshot, one job. */
  def mergeWrite(old: DataFrame, changes: DataFrame, key: String, path: String): Unit =
    truncateLoad(SnapshotDiff.applyChangeset(old, changes, key), path)
}
