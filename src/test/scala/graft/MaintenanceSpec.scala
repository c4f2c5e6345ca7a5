package graft

import org.apache.spark.sql.functions._

/** Table-maintenance gates: compaction reduces file count without
  * touching content; schema-merge reads reconcile generations. */
class MaintenanceSpec extends SparkSpec {

  test("compaction collapses the fragmented table into few files, content identical") {
    val events = Tables.events(spark, sfDir)
    val (frag, comp) = ops.Maintenance.compactEvents(spark, events)
    val nFrag = ops.Maintenance.parquetFileCount(spark, frag)
    val nComp = ops.Maintenance.parquetFileCount(spark, comp)
    assert(nFrag >= 32, s"fragmented table should have many files, got $nFrag")
    assert(nComp <= 8, s"compacted table should have few files, got $nComp")
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(comp)
    assert(a.count() === b.count())
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("schema-merge scan nulls the column missing from generation 1") {
    val merged = ops.Scans.scanSchemaMerge(spark, Tables.nation(spark, sfDir), sfDir)
    assert(merged.columns.toSet === Set("n_nationkey", "n_name", "n_regionkey"))
    assert(merged.filter(col("n_nationkey") % 2 === 0 && col("n_regionkey").isNotNull).count() === 0)
    assert(merged.filter(col("n_nationkey") % 2 === 1 && col("n_regionkey").isNull).count() === 0)
  }
}
