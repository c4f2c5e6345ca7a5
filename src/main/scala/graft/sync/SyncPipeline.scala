package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's end-to-end verbs (R15, syncquill.py:217-239),
  * re-expressed as one set-based Spark job each:
  *
  *  - `sync`: diff the source snapshot against the target table, preview
  *    the changeset, apply it as ONE merge write (vs the reference's one
  *    DML round-trip per changed cell / deleted row, syncquill.py:87,105).
  *  - `upsert`: truncate-and-load the target from the source (R11).
  *
  * Auth/config (R13/R14) collapse to SparkSession config + method args —
  * there is no OAuth dance against parquet. Validation (R2) runs first
  * and fails fast like the reference (syncquill.py:67-74), but reports
  * ALL violations, not just the first.
  */
object SyncPipeline {

  final case class SyncResult(changes: Long, inserts: Long, deletes: Long, updates: Long)

  /** R2 fail-fast validation: null key or empty string cell anywhere. */
  def validate(snapshot: DataFrame, key: String): Unit = {
    import org.apache.spark.sql.functions._
    val stringCols = snapshot.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType).map(_.name)
    val bad = snapshot.filter(
      col(key).isNull || stringCols.map(c => col(c) === "").foldLeft(lit(false))(_ || _))
    val n = bad.count()
    require(n == 0, s"validation failed: $n rows with null key or empty cells")
  }

  /** `sync` verb: snapshot-diff + preview + one-job merge apply. */
  def sync(spark: SparkSession, sourcePath: String, targetPath: String,
           key: String, preview: Boolean = true): SyncResult = {
    val source = spark.read.parquet(sourcePath)
    val target = spark.read.parquet(targetPath)
    validate(source, key)
    val changes = SnapshotDiff.diffKeyed(target, source, key).persist()
    try {
      val byOp = changes.groupBy("op").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = byOp.values.sum
      if (preview) PrettyPrint.show(changes)
      if (total == 0) { println("No changes."); SyncResult(0, 0, 0, 0) }
      else {
        // stage the merged snapshot fully, then promote it over the target
        // (metadata-only rename — the merge job has already completed, so
        // the non-atomic delete+rename window holds only directory moves,
        // never a partially-written table)
        val staging = targetPath + ".next"
        Sinks.mergeWrite(target, changes, key, staging)
        val tgt = new org.apache.hadoop.fs.Path(targetPath)
        val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(tgt, true)
        require(fs.rename(new org.apache.hadoop.fs.Path(staging), tgt),
          s"failed to promote $staging over $targetPath")
        SyncResult(total, byOp.getOrElse("insert", 0), byOp.getOrElse("delete", 0),
          byOp.getOrElse("update", 0))
      }
    } finally { changes.unpersist(); () }
  }

  /** `upsert` verb: whole-source truncate-and-load (R11). */
  def upsert(spark: SparkSession, sourcePath: String, targetPath: String, key: String): Unit = {
    val source = spark.read.parquet(sourcePath)
    validate(source, key)
    Sinks.truncateLoad(source, targetPath)
  }

  /** CLI (R14/R15): `sync|upsert <sourceParquet> <targetParquet> <key>`.
    * Config resolution mirrors the reference's args-with-env-fallback
    * (syncquill.py:158-161). */
  def main(args: Array[String]): Unit = {
    def argOrEnv(i: Int, env: String): String =
      args.lift(i).orElse(sys.env.get(env)).getOrElse(
        throw new IllegalArgumentException(s"missing arg $i / $$$env"))
    val action = argOrEnv(0, "GRAFT_ACTION")
    val source = argOrEnv(1, "GRAFT_SOURCE")
    val target = argOrEnv(2, "GRAFT_TARGET")
    val key = args.lift(3).orElse(sys.env.get("GRAFT_KEY")).getOrElse("slno")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try action match {
      case "sync" =>
        val r = sync(spark, source, target, key)
        println(s"applied: ${r.changes} changes (${r.inserts} ins, ${r.deletes} del, ${r.updates} upd)")
      case "upsert" =>
        upsert(spark, source, target, key)
        println("upsert complete")
      case other => throw new IllegalArgumentException(s"unknown action: $other (want sync|upsert)")
    } finally spark.stop()
  }
}
