package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one implementation of the persisted EPOCH-ARTIFACT resolution
  * every `ensure*` builder shares (band index, IVF/PQ indexes, BPE merge
  * model, DSIR counts, quantile histogram): if the table is already in
  * the catalog, serve it; otherwise clear any ORPHANED warehouse
  * directory first (the in-memory catalog forgets tables across JVMs but
  * the warehouse files survive — `saveAsTable` would refuse or, worse,
  * append over the corpse) and run the builder's write. Centralized
  * because the orphan-cleanup subtlety was copy-pasted five times and a
  * fix to it (e.g. the lowercase normalization below) must hold
  * everywhere at once.
  *
  * Identifier case: `saveAsTable` lowercases the on-disk directory, so
  * the orphan delete must target the LOWERCASED path or a mixed-case
  * artifact name would clean the wrong (nonexistent) directory and trip
  * over the real corpse at write time. `ensure` normalizes the whole
  * name instead, so catalog name and directory always agree. */
object Warehouse {

  /** First-input-file tag for artifact names: ties the artifact to its
    * source dataset so two datasets at the same epoch can never serve
    * each other's artifact. NOTE: frames DERIVED from the same files
    * (filters, column edits) share a tag — distinct derivations need
    * distinct epochs, which is what the epoch parameter is for. */
  def srcTag(df: DataFrame): String =
    df.inputFiles.headOption.getOrElse("mem")
      .replaceAll("[^A-Za-z0-9]", "_").toLowerCase

  /** Resolve-or-build: returns the (normalized) table name; `write`
    * runs only on first resolution and must create `name` (and any
    * `companions`, e.g. an index's `<name>_model` table). */
  def ensure(spark: SparkSession, rawName: String, companions: Seq[String] = Nil)
            (write: String => Unit): String = {
    val name = rawName.toLowerCase
    if (!spark.catalog.tableExists(name)) {
      (name +: companions.map(_.toLowerCase)).foreach(dropOrphanDir(spark, _))
      write(name)
    }
    name
  }

  private def dropOrphanDir(spark: SparkSession, name: String): Unit = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$name")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) { fs.delete(loc, true); () }
  }
}
