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

  test("z-order layout: boxes on the secondary dim prune partitions; single-key layout cannot") {
    val li = Tables.lineitem(spark, sfDir)
    // a box on the SECONDARY dimension only — the case a partkey-sorted
    // layout cannot prune at all (every partition spans all suppkeys),
    // while the z-curve confines it to the partitions whose range admits
    // the fixed high suppkey bits
    val box = col("l_suppkey").between(4, 5)
    val parts = 64
    // localCheckpoint pins the physical partitioning so spark_partition_id
    // reflects the written layout (RangePartitioner re-samples per job)
    val zLaid = ops.Maintenance.zorderLayout(li, parts).localCheckpoint()
    val zParts = zLaid.filter(box).select(spark_partition_id()).distinct().count()
    val linear = li.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .repartitionByRange(parts, col("l_partkey"))
      .sortWithinPartitions("l_partkey").localCheckpoint()
    val lParts = linear.filter(box).select(spark_partition_id()).distinct().count()
    assert(zParts * 2 <= lParts,
      s"z-order box hit $zParts of $parts partitions, single-key layout $lParts — no locality win")
    // and the rewrite is content-preserving on the selected columns
    val zAll = zLaid.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val src = li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    assert(zAll.exceptAll(src).count() === 0 && src.exceptAll(zAll).count() === 0)
  }

  test("z-order key is a bijection: decoded bits recover both inputs") {
    import org.apache.spark.sql.Row
    // every (a, b) in the 8-bit domain corners + random interior points
    // must round-trip through the interleave: a = even bits, b = odd bits
    val pts = Seq((0L, 0L), (255L, 255L), (255L, 0L), (0L, 255L),
      (1L, 2L), (170L, 85L), (129L, 64L), (37L, 201L))
    import spark.implicits._
    val df = pts.toDF("a", "b")
      .withColumn("z", ops.Maintenance.zorderKey(col("a"), col("b"), 8))
    val back = df.select(col("a"), col("b"),
      (0 until 8).map(i => shiftleft(shiftright(col("z"), 2 * i).bitwiseAND(1), i))
        .reduce(_ + _).as("a2"),
      (0 until 8).map(i => shiftleft(shiftright(col("z"), 2 * i + 1).bitwiseAND(1), i))
        .reduce(_ + _).as("b2"))
    back.collect().foreach { case Row(a: Long, b: Long, a2: Long, b2: Long) =>
      assert(a === a2 && b === b2, s"interleave not invertible at ($a, $b)")
    }
  }

  test("sequence packing: every sequence stays within budget + one chunk") {
    val budget = 256L // packSequences maxTokens default
    val maxChunk = 32L // TextAnalysis.chunk chunkSize default
    val packed = llm.TrainingPrep.packSequences(Tables.documents(spark, sfDir),
      maxTokens = budget.toInt)
    // one aggregation job; both invariants read the collected rows
    val rows = packed.groupBy("lang", "seq_id")
      .agg(sum("n_tokens").as("total")).collect()
    assert(rows.nonEmpty)
    // concat-and-cut: a sequence can only exceed the budget by the chunk
    // that straddles its boundary
    rows.foreach(r => assert(r.getLong(2) <= budget + maxChunk,
      s"overfull sequence: ${r.getLong(2)} tokens"))
    // and sequences are dense: all but the last per lang hold >= budget - maxChunk
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val totals = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      totals.dropRight(1).foreach(t =>
        assert(t >= budget - maxChunk, s"$lang has a sparse non-final sequence: $t"))
    }
  }

  test("schema-merge scan nulls the column missing from generation 1") {
    val merged = ops.Scans.scanSchemaMerge(spark, Tables.nation(spark, sfDir), sfDir)
    assert(merged.columns.toSet === Set("n_nationkey", "n_name", "n_regionkey"))
    assert(merged.filter(col("n_nationkey") % 2 === 0 && col("n_regionkey").isNotNull).count() === 0)
    assert(merged.filter(col("n_nationkey") % 2 === 1 && col("n_regionkey").isNull).count() === 0)
  }
}
