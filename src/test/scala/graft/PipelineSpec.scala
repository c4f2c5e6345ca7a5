package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sync.{PrettyPrint, Snapshots, SnapshotDiff, SyncPipeline}
import graft.streaming.Streams

case class Snap(slno: Long, name: String, acctbal: String, segment: String,
                ts: Timestamp)

/** End-to-end pipeline gates: the sync/upsert verbs against real parquet
  * dirs, the ASCII changeset preview, the SQL extension functions, and
  * the streaming foreachBatch merge sink.
  */
class PipelineSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft_pipe").toString

  test("sync verb: diff + merge apply round-trips the source snapshot") {
    val dir = tmpDir()
    val c = Tables.customer(spark, sfDir)
    val old = Snapshots.oldSnapshot(c)
    val neu = Snapshots.newSnapshot(c)
    old.write.mode("overwrite").parquet(s"$dir/target")
    neu.write.mode("overwrite").parquet(s"$dir/source")

    val r = SyncPipeline.sync(spark, s"$dir/source", s"$dir/target", "slno", preview = false)
    assert(r.changes > 0 && r.inserts > 0 && r.deletes > 0 && r.updates > 0)
    // the merged snapshot is PROMOTED into the target (staging dir gone)
    val merged = spark.read.parquet(s"$dir/target")
    assert(merged.exceptAll(neu).count() === 0 && neu.exceptAll(merged).count() === 0)
    assert(!new java.io.File(s"$dir/target.next").exists())
    // a re-run against the promoted target is a no-op
    val r2 = SyncPipeline.sync(spark, s"$dir/source", s"$dir/target", "slno", preview = false)
    assert(r2 === SyncPipeline.SyncResult(0, 0, 0, 0))
  }

  test("sync verb: no-op when source == target") {
    val dir = tmpDir()
    val old = Snapshots.oldSnapshot(Tables.customer(spark, sfDir))
    old.write.mode("overwrite").parquet(s"$dir/target")
    old.write.mode("overwrite").parquet(s"$dir/source")
    val r = SyncPipeline.sync(spark, s"$dir/source", s"$dir/target", "slno", preview = false)
    assert(r === SyncPipeline.SyncResult(0, 0, 0, 0))
  }

  test("sync composes over the connector seam: CSV source, CSV and parquet targets") {
    import graft.sync.{CsvSource, CsvTarget, ParquetTarget}
    val dir = tmpDir()
    val c = Tables.customer(spark, sfDir)
    // all-string snapshots: the Sheets data model the CSV connector mirrors
    allString(Snapshots.oldSnapshot(c)).write
      .option("header", "true").csv(s"$dir/target")
    allString(Snapshots.newSnapshot(c)).write
      .option("header", "true").csv(s"$dir/source")

    val r = SyncPipeline.sync(spark, CsvSource(s"$dir/source"), CsvTarget(s"$dir/target"),
      "slno", preview = false)
    assert(r.changes > 0 && r.inserts > 0 && r.deletes > 0 && r.updates > 0)
    val merged = spark.read.option("header", "true").csv(s"$dir/target")
    val want = spark.read.option("header", "true").csv(s"$dir/source")
    assert(merged.exceptAll(want).count() === 0 && want.exceptAll(merged).count() === 0)

    // heterogeneous composition: the SAME CSV source merged into parquet
    allString(Snapshots.oldSnapshot(c)).write.mode("overwrite").parquet(s"$dir/ptarget")
    val r2 = SyncPipeline.sync(spark, CsvSource(s"$dir/source"), ParquetTarget(s"$dir/ptarget"),
      "slno", preview = false)
    assert(r2.changes === r.changes)
    val pm = spark.read.parquet(s"$dir/ptarget")
    assert(pm.exceptAll(want).count() === 0 && want.exceptAll(pm).count() === 0)
  }

  test("sync verb end-to-end from the Sheets values().get wire format") {
    import graft.sync.{ParquetTarget, SheetsJsonSource}
    import spark.implicits._
    val dir = tmpDir()
    val fixture = getClass.getResource("/sheets_values_get.json").getPath
    // parser alone: header row becomes the all-string schema, in order
    val src = SheetsJsonSource(fixture).read(spark)
    assert(src.columns.toSeq === Seq("slno", "name", "segment"))
    assert(src.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType))
    assert(src.count() === 3)
    // end-to-end: the fixture syncs into a parquet target seeded with an
    // older snapshot — slno 2 updates, 3 deletes, 4 inserts
    Seq(("1", "alice", "S1"), ("2", "bob", "S2"), ("3", "carol", "S3"))
      .toDF("slno", "name", "segment").write.mode("overwrite").parquet(s"$dir/target")
    val r = SyncPipeline.sync(spark, SheetsJsonSource(fixture),
      ParquetTarget(s"$dir/target"), "slno", preview = false)
    assert(r === SyncPipeline.SyncResult(3, 1, 1, 1))
    val merged = spark.read.parquet(s"$dir/target")
    assert(merged.exceptAll(src).count() === 0 && src.exceptAll(merged).count() === 0)
  }

  test("Sheets source fails fast on a short row, naming the sheet row (syncquill.py:66-74)") {
    import graft.sync.SheetsJsonSource
    val fixture = getClass.getResource("/sheets_values_get_shortrow.json").getPath
    val e = intercept[IllegalArgumentException] {
      SheetsJsonSource(fixture).read(spark)
    }
    // row 3 of the sheet (header is row 1) omits its trailing cell
    assert(e.getMessage.contains("sheet row 3"), e.getMessage)
  }

  test("R14 config: positional arg wins, env var falls back, missing fails with both names") {
    val env = Map("GRAFT_ACTION" -> "upsert")
    assert(SyncPipeline.argOrEnv(Array("sync"), 0, "GRAFT_ACTION", env) === "sync")
    assert(SyncPipeline.argOrEnv(Array.empty[String], 0, "GRAFT_ACTION", env) === "upsert")
    val e = intercept[IllegalArgumentException] {
      SyncPipeline.argOrEnv(Array.empty[String], 1, "GRAFT_SOURCE", env)
    }
    assert(e.getMessage.contains("arg 1") && e.getMessage.contains("GRAFT_SOURCE"))
  }

  test("sync into a JDBC target applies the changeset as per-op DML") {
    import graft.sync.{CsvSource, JdbcTarget}
    val dir = tmpDir()
    val url = "jdbc:derby:memory:syncjdbc;create=true"
    val c = Tables.customer(spark, sfDir)
    val tgt = JdbcTarget(url, "SYNC_T")
    // WRITE_TRUNCATE load of the old snapshot into Derby
    tgt.truncateLoad(allString(Snapshots.oldSnapshot(c)))
    assert(tgt.read(spark).count() === Snapshots.oldSnapshot(c).count())

    allString(Snapshots.newSnapshot(c)).write
      .option("header", "true").csv(s"$dir/source")
    val r = SyncPipeline.sync(spark, CsvSource(s"$dir/source"), tgt,
      "slno", preview = false)
    assert(r.changes > 0 && r.inserts > 0 && r.deletes > 0 && r.updates > 0)
    // the DML-applied table IS the new snapshot (set equality)
    val got = tgt.read(spark)
    val want = spark.read.option("header", "true").csv(s"$dir/source")
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
    // and a re-run against the mutated table is a no-op
    val r2 = SyncPipeline.sync(spark, CsvSource(s"$dir/source"), tgt,
      "slno", preview = false)
    assert(r2 === SyncPipeline.SyncResult(0, 0, 0, 0))
  }

  test("JDBC DML binds values as parameters: quotes, unicode and nulls round-trip") {
    import graft.sync.{JdbcTarget, ParquetSource}
    val dir = tmpDir()
    val url = "jdbc:derby:memory:syncjdbc2;create=true"
    import spark.implicits._
    // values a string-concatenated DML would corrupt or inject through
    val old = Seq(
      ("1", "O'Neill; DROP TABLE x", "a"),
      ("2", "line\" quote", "b"),
      ("3", "naïve — ünïcödé", "c")).toDF("slno", "name", "seg")
    val neu = Seq(
      ("1", "O'Neill; DROP TABLE x", "a"),        // unchanged
      ("2", "it's \"quoted\"", "b"),              // update with both quote kinds
      ("4", "Zoë's new row", null)).toDF("slno", "name", "seg") // insert w/ null cell; 3 deleted
    val tgt = JdbcTarget(url, "NASTY_T")
    tgt.truncateLoad(old)
    neu.write.mode("overwrite").parquet(s"$dir/src")
    val r = SyncPipeline.sync(spark, ParquetSource(s"$dir/src"), tgt, "slno", preview = false)
    assert(r === SyncPipeline.SyncResult(3, 1, 1, 1))
    // read back through the SOURCE half of the pair too, so JdbcSource
    // (not just JdbcTarget.read) has coverage
    val got = graft.sync.JdbcSource(url, "NASTY_T").read(spark)
    assert(got.exceptAll(neu).count() === 0 && neu.exceptAll(got).count() === 0)
  }

  test("JDBC DML matches rows by canonicalized key, preserving stored key text") {
    import graft.sync.{JdbcTarget, ParquetSource}
    val dir = tmpDir()
    val url = "jdbc:derby:memory:syncjdbc3;create=true"
    import spark.implicits._
    // the changeset labels rows with the key CANONICALIZED TO LONG
    // ('08' -> slno 8) while the table stores the original text; the DML
    // must still hit the stored rows — binding the canonical form
    // directly ('8', '9') would match nothing and silently diverge.
    // (Key-text differences like '007' vs '7' are delete+insert by the
    // string-keyed diff join, exercised here too.)
    val old = Seq(("007", "old"), ("08", "keep"), ("009", "gone")).toDF("slno", "name")
    val neu = Seq(("7", "new"), ("08", "kept2")).toDF("slno", "name")
    val tgt = JdbcTarget(url, "CANON_T")
    tgt.truncateLoad(old)
    neu.write.mode("overwrite").parquet(s"$dir/src")
    val r = SyncPipeline.sync(spark, ParquetSource(s"$dir/src"), tgt, "slno", preview = false)
    // '007'/'009' delete (slno 7, 9 -> stored text), '7' inserts,
    // '08' updates in place (slno 8 -> stored '08')
    assert(r === SyncPipeline.SyncResult(4, 1, 2, 1))
    val got = tgt.read(spark).collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(got === Set(("7", "new"), ("08", "kept2")))
    // re-run: no-op (idempotence would break if the update missed)
    val r2 = SyncPipeline.sync(spark, ParquetSource(s"$dir/src"), tgt, "slno", preview = false)
    assert(r2 === SyncPipeline.SyncResult(0, 0, 0, 0))
  }

  test("merge crash mid-apply: default mode half-applies faithfully, atomic mode rolls back") {
    import graft.sync.JdbcTarget
    import spark.implicits._
    // a target with a PRIMARY KEY so a crafted changeset can make the
    // LAST pass (inserts) fail deterministically mid-merge
    def freshTarget(db: String): JdbcTarget = {
      val url = s"jdbc:derby:memory:$db;create=true"
      java.lang.Class.forName(graft.sync.Connectors.DerbyDriver)
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        st.execute("""CREATE TABLE CRASH_T ("slno" VARCHAR(50) NOT NULL, "name" VARCHAR(50), "seg" VARCHAR(50), PRIMARY KEY ("slno"))""")
        st.execute("INSERT INTO CRASH_T VALUES ('1', 'one', 'a'), ('2', 'two', 'b'), ('3', 'three', 'c')")
        st.close()
      } finally conn.close()
      JdbcTarget(url, "CRASH_T")
    }
    def rows(t: JdbcTarget) = t.read(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val merged = Seq(("x", "y", "z")).toDF("slno", "name", "seg") // schema carrier
    // delete 3, update 2, then an insert whose key '1' VIOLATES the PK
    // (still present) — the insert pass runs LAST and fails
    val poison = Seq(
      ("delete", 3L, "", """{"name":"three","seg":"c"}""", null: String),
      ("update", 2L, "name", "two", "two2"),
      ("insert", 1L, "", null: String, """{"name":"dup","seg":"z"}""")
    ).toDF("op", "slno", "col", "old_val", "new_val").localCheckpoint()

    // HALF-APPLY contract (reference-faithful, syncquill.py:86-107):
    // the passes BEFORE the failing insert stay committed, the failing
    // pass rolls back as a unit, the error propagates
    val half = freshTarget("synccrash1")
    intercept[Exception] { half.merge(spark, merged, poison, "slno") }
    assert(rows(half) === Set(("1", "one", "a"), ("2", "two2", "b")),
      "default mode must keep the delete+update and lose only the failing insert")
    // and a re-run after fixing the changeset completes the apply — the
    // resume-from-half model the reference's error handling implies
    val remainder = Seq(
      ("insert", 9L, "", null: String, """{"name":"nine","seg":"z"}""")
    ).toDF("op", "slno", "col", "old_val", "new_val").localCheckpoint()
    half.merge(spark, merged, remainder, "slno")
    assert(rows(half) === Set(("1", "one", "a"), ("2", "two2", "b"), ("9", "nine", "z")))

    // ATOMIC contract: same poison changeset, one transaction — failure
    // leaves the target byte-identical to its pre-merge state
    val atomicT = freshTarget("synccrash2")
    intercept[Exception] { atomicT.merge(spark, merged, poison, "slno", atomic = true) }
    assert(rows(atomicT) === Set(("1", "one", "a"), ("2", "two", "b"), ("3", "three", "c")),
      "atomic mode must roll the whole changeset back")
    // and a clean changeset applies fully through the atomic path
    val ok = Seq(
      ("delete", 3L, "", """{"name":"three","seg":"c"}""", null: String),
      ("update", 2L, "name", "two", "two2"),
      ("insert", 9L, "", null: String, """{"name":"nine","seg":"z"}""")
    ).toDF("op", "slno", "col", "old_val", "new_val").localCheckpoint()
    atomicT.merge(spark, merged, ok, "slno", atomic = true)
    assert(rows(atomicT) === Set(("1", "one", "a"), ("2", "two2", "b"), ("9", "nine", "z")))
  }

  test("JDBC DML handles op classes larger than the statement batch (500)") {
    import graft.sync.{JdbcTarget, ParquetSource}
    val dir = tmpDir()
    val url = "jdbc:derby:memory:syncjdbc4;create=true"
    // 600 deletes, 600 single-column updates, 600 inserts: every op
    // class crosses the 500-row executeBatch boundary (prior tests never
    // did), so DML executes while the pass's stored-key lookup COULD
    // still hold a cursor on the mutating table. merge materializes that
    // lookup up front (localCheckpoint) precisely so no plan shape can
    // interleave an open Derby read with its own write locks — this gate
    // pins the multi-batch path; the old lazy wiring happened to survive
    // it only because the join plan shuffled the JDBC scan first.
    val old = spark.range(0, 1400).select(col("id").cast("string").as("slno"),
      concat(lit("name"), col("id")).as("name"), lit("x").as("seg"))
    val neu = spark.range(600, 2000).select(col("id").cast("string").as("slno"),
      when(col("id") < 1200, concat(lit("NEW"), col("id")))
        .otherwise(concat(lit("name"), col("id"))).as("name"), lit("x").as("seg"))
    val tgt = JdbcTarget(url, "BIG_T")
    tgt.truncateLoad(old)
    neu.write.mode("overwrite").parquet(s"$dir/src")
    val r = SyncPipeline.sync(spark, ParquetSource(s"$dir/src"), tgt, "slno", preview = false)
    assert(r === SyncPipeline.SyncResult(1800, 600, 600, 600))
    val got = tgt.read(spark)
    assert(got.exceptAll(neu).count() === 0 && neu.exceptAll(got).count() === 0)
  }

  test("upsert verb truncate-loads; validation rejects empty cells") {
    val dir = tmpDir()
    val neu = Snapshots.newSnapshot(Tables.customer(spark, sfDir))
    neu.write.mode("overwrite").parquet(s"$dir/source")
    SyncPipeline.upsert(spark, s"$dir/source", s"$dir/target", "slno")
    assert(spark.read.parquet(s"$dir/target").count() === neu.count())

    val dirty = neu.withColumn("segment",
      when(col("slno") % 5 === 0, lit("")).otherwise(col("segment")))
    dirty.write.mode("overwrite").parquet(s"$dir/dirty")
    val e = intercept[IllegalArgumentException] {
      SyncPipeline.upsert(spark, s"$dir/dirty", s"$dir/target2", "slno")
    }
    assert(e.getMessage.contains("validation failed"))
  }

  test("pretty-print renders the reference-style ASCII changeset table") {
    val c = Tables.customer(spark, sfDir)
    val changes = SnapshotDiff.diffKeyed(
      Snapshots.oldSnapshot(c), Snapshots.newSnapshot(c), "slno")
    val out = PrettyPrint.render(changes, maxRows = 10)
    assert(out.contains("| op") && out.contains("slno") && out.startsWith("+-"))
    assert(out.linesIterator.size >= 5)
    val empty = PrettyPrint.render(changes.filter(col("op") === "nope"))
    assert(empty === "No changes.\n")
  }

  test("GraftExtensions registers the custom expression family in SQL") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       vec_norm(array(3.0d, 4.0d)) AS n,
        |       word_shingles(array('a','b','c'), 2) AS sh,
        |       rolling_fingerprint('abc') AS fp,
        |       minhash_sig(array('a b c'), 4) AS sig""".stripMargin).collect().head
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 5.0)
    assert(r.getSeq[String](2) === Seq("a b", "b c"))
    assert(r.getLong(3) === (('a' * 31L + 'b') * 31 + 'c') % 1000000007L)
    assert(r.getSeq[Long](4).length === 4)
    // the sketch aggregate in SQL: top item of a skewed literal stream
    val agg = spark.sql(
      """SELECT topk_sketch(x, 1, 8) AS top FROM VALUES ('a'),('a'),('b') AS t(x)"""
    ).collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(agg.head.getString(0) === "a" && agg.head.getLong(1) === 2L)
    // the Bloom pair end-to-end in SQL: build over a key stream, probe a
    // member and a non-member through a scalar subquery (the foldable
    // form BloomFilterMightContain demands)
    val bloom = spark.sql(
      """SELECT graft_might_contain(
        |         (SELECT graft_bloom_agg(x, 10L, 1024L) FROM VALUES ('k1'),('k2') AS t(x)),
        |         y) AS hit
        |FROM VALUES ('k1'),('nope') AS p(y) ORDER BY y""".stripMargin)
      .collect().map(_.getBoolean(0)).toSeq
    assert(bloom === Seq(true, false),
      "member must probe true, non-member false at 1024 bits / 2 keys")
  }

  test("foreachBatch merge sink upserts each micro-batch into the parquet target") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    val target = s"$dir/merge_target"
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:${min}%02d:00")
    val stream = MemoryStream[Snap]
    val query = Streams.foreachBatchMerge(stream.toDF(), target, "slno")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      stream.addData(Snap(1, "a", "1.00", "S1", t(0)), Snap(2, "b", "2.00", "S1", t(1)))
      query.processAllAvailable()
      assert(Streams.readSnapshot(spark, target).get.count() === 2)
      // batch 2: update slno=2, insert slno=3
      stream.addData(Snap(2, "b2", "2.50", "S2", t(2)), Snap(3, "c", "3.00", "S1", t(3)))
      query.processAllAvailable()
      val rows = Streams.readSnapshot(spark, target).get.orderBy("slno").collect()
      assert(rows.length === 3)
      assert(rows(1).getAs[String]("name") === "b2")
      // the manifest names the live snapshot; a stale version may remain
      // for in-flight readers but the pointed-at dir is always complete
      assert(Streams.currentSnapshotDir(spark, target).get.endsWith("snap-000000000001"))
    } finally query.stop()
  }

  test("merge sink replay: re-running a published batchId is a no-op") {
    import spark.implicits._
    val dir = tmpDir()
    val target = s"$dir/replay_target"
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:${min}%02d:00")
    val b0 = Seq(Snap(1, "a", "1.00", "S1", t(0)), Snap(2, "b", "2.00", "S1", t(1))).toDF()
    val b1 = Seq(Snap(2, "b2", "2.50", "S2", t(2)), Snap(3, "c", "3.00", "S1", t(3))).toDF()
    Streams.mergeBatch(b0, 0, target, "slno")
    Streams.mergeBatch(b1, 1, target, "slno")
    val before = Streams.readSnapshot(spark, target).get.orderBy("slno").collect().toSeq
    val dirBefore = Streams.currentSnapshotDir(spark, target).get
    // crash-replay of the last committed batch (exactly-once contract):
    // the manifest already names snap-1, so the merge must be skipped
    Streams.mergeBatch(b1, 1, target, "slno")
    assert(Streams.currentSnapshotDir(spark, target).get === dirBefore)
    val after = Streams.readSnapshot(spark, target).get.orderBy("slno").collect().toSeq
    assert(after === before, "replayed batch changed the published snapshot")
    assert(after.length === 3)
  }

  test("lang temperature: weights sum to 1, head flattens, low-resource langs boost") {
    val out = graft.llm.TrainingPrep.langTemperature(Tables.documents(spark, sfDir))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty)
    // weights are a distribution (4dp rounding slack)
    val wSum = out.map(_._4).sum
    assert(math.abs(wSum - 1.0) < 0.001, s"weights sum $wSum")
    // alpha < 1 flattens: the dominant language's weight sits BELOW its
    // share (boost < 1), the rarest language's above (boost > 1)
    val byShare = out.sortBy(-_._3)
    assert(byShare.head._5 < 1.0, s"dominant lang boost ${byShare.head}")
    assert(byShare.last._5 > 1.0, s"rarest lang boost ${byShare.last}")
    // monotone: larger share never yields a larger boost
    byShare.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi._5 <= lo._5 + 0.0001, s"boost not monotone: $hi vs $lo")
    }
  }

  test("shard skew audit: accounts for every doc/token on the shuffle_shard assignment (r9)") {
    val docs = Tables.documents(spark, sfDir)
    val got = graft.llm.TrainingPrep.shardSkew(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // accounting: shard doc counts sum to the corpus; shares sum to ~1
    assert(got.map(_._2).sum === docs.count())
    assert(math.abs(got.map(_._4).sum - 1.0) < 0.002)
    assert(math.abs(got.map(_._5).sum - 1.0) < 0.002)
    // same assignment shuffle_shard writes: per-shard doc counts agree
    val fromShuffle = graft.llm.TrainingPrep.shuffleShard(docs).collect()
      .groupBy(_.getString(2)).map { case (s, xs) => s -> xs.length.toLong }
    assert(got.map(g => g._1 -> g._2).toMap === fromShuffle)
    // hex-digit shard domain only
    assert(got.forall(g => g._1.length == 1 && "0123456789abcdef".contains(g._1)))
  }

  test("interleave mixture: exact stride replay and the prefix-share bound (r9)") {
    val weights = Map("en" -> 5, "zh" -> 2, "de" -> 1, "es" -> 1, "fr" -> 1)
    val rows = graft.llm.TrainingPrep.interleaveMixture(Tables.documents(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // exact replay: per-lang arrival index, vt = rn · (2520 div w)
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (l, xs) =>
      val pass = 2520L / weights.getOrElse(l, 1)
      xs.map(_._1).sorted.zipWithIndex.map { case (id, i) =>
        (id, l, (i + 1).toLong, (i + 1) * pass)
      }
    }.sortBy(t => (t._4, t._2, t._1))
    assert(rows.toSeq === expect)
    // stride-scheduling law: until the first language exhausts, every
    // prefix holds each language within ~one slot of its weighted share
    val byLang = docs.groupBy(_._2).map { case (l, xs) => l -> xs.length }
    val wTot = weights.values.sum
    val firstExhaust = byLang.map { case (l, n) =>
      n.toLong * wTot / weights.getOrElse(l, 1)
    }.min.toInt min rows.length
    val langsSeq = rows.map(_._2)
    var maxDev = 0.0
    for (k <- 1 to firstExhaust) {
      val prefix = langsSeq.take(k)
      weights.foreach { case (l, w) =>
        val dev = math.abs(prefix.count(_ == l) - k.toDouble * w / wTot)
        maxDev = math.max(maxDev, dev)
      }
    }
    assert(maxDev <= 1.5 + 1e-9, s"prefix-share deviation $maxDev exceeds the stride bound")
  }

  test("dataset card: facets reconcile with their standalone computations") {
    val documents = Tables.documents(spark, sfDir)
    val card = graft.llm.TrainingPrep.datasetCard(documents).collect()
    // the card partitions the corpus: per-source doc counts sum to the total
    assert(card.map(_.getLong(1)).sum === documents.count())
    // dup_rate reconciles with an independent per-source digest count,
    // through the same one-rounding expression
    val bySrc = documents.groupBy("source")
      .agg(countDistinct(md5(col("text"))).as("nd"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    card.foreach { r =>
      val (nd, n) = bySrc(r.getString(0))
      assert(r.getLong(1) === n, s"n_docs mismatch for ${r.getString(0)}")
      val dr = math.floor((n - nd).toDouble / n * 1e4 + 0.5) / 1e4
      assert(r.getDouble(3) === dr, s"dup_rate mismatch for ${r.getString(0)}")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0, "top_lang_share out of range")
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0, "mean_quality out of range")
    }
    // dominant language reconciles with a direct mode computation
    val naive = documents.collect()
      .groupBy(r => r.getString(r.fieldIndex("source")))
      .map { case (s, rows) =>
        val top = rows.groupBy(r => Option(r.getString(r.fieldIndex("lang"))))
          .map { case (l, rs) => (l, rs.size) }.toSeq
          .minBy { case (l, c) => (-c, l.isEmpty, l.getOrElse("")) }
        s -> top._1.orNull
      }
    card.foreach(r => assert(r.getString(4) === naive(r.getString(0)),
      s"top_lang mismatch for ${r.getString(0)}"))
  }
}
