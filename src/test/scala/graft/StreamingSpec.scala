package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** True Structured Streaming gates (DuckDB has no streams — SURVEY §5.4):
  * chunked-equivalence vs the batch form, watermark late-data drop, and
  * dedup-within-watermark.
  */
class StreamingSpec extends SparkSpec {

  private def loadEvents(): Seq[Ev] = {
    Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
  }

  test("streaming tumbling agg over ordered chunks == batch result") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val evs = loadEvents()
    val stream = MemoryStream[Ev]
    val query = Streams.streamingTumbling(stream.toDF())
      .writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    try {
      evs.grouped(math.max(1, evs.size / 5)).foreach { chunk =>
        stream.addData(chunk); query.processAllAvailable()
      }
      val streamed = spark.table("tumb")
        .select("w_start", "event_type", "n", "sum_value")
        .orderBy("w_start", "event_type").collect().toSeq
      val batch = Streams.tumblingBatch(Tables.events(spark, sfDir)).collect().toSeq
      assert(streamed === batch)
    } finally query.stop()
  }

  test("stream-static enrichment join over chunks == batch result") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val evs = loadEvents()
    val customer = Tables.customer(spark, sfDir)
    val stream = MemoryStream[Ev]
    val query = Streams.enrichAgg(stream.toDF(), customer)
      .writeStream.format("memory").queryName("enrich").outputMode("complete").start()
    try {
      evs.grouped(math.max(1, evs.size / 4)).foreach { chunk =>
        stream.addData(chunk); query.processAllAvailable()
      }
      val streamed = spark.table("enrich")
        .orderBy("c_mktsegment", "event_type").collect().toSeq
      val batch = Streams.enrichBatch(Tables.events(spark, sfDir), customer).collect().toSeq
      assert(streamed === batch)
    } finally query.stop()
  }

  test("watermark drops events later than the delay") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    val stream = MemoryStream[Ev]
    val query = Streams.streamingTumbling(stream.toDF(), delay = "10 minutes")
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    try {
      stream.addData(Ev(1, t(0), 1, "click", 1.0), Ev(2, t(5), 1, "click", 1.0))
      query.processAllAvailable()
      // advance watermark far past the 10:00 window
      stream.addData(Ev(3, t(180), 1, "click", 1.0))
      query.processAllAvailable()
      // late arrival into the long-closed 10:00 window → must be dropped
      stream.addData(Ev(4, t(10), 1, "click", 1.0))
      query.processAllAvailable()
      stream.addData(Ev(5, t(360), 1, "click", 1.0))
      query.processAllAvailable()
      val rows = spark.table("late")
        .filter(col("w_start") === Timestamp.valueOf("2024-01-01 10:00:00"))
        .select("n").collect()
      assert(rows.length === 1 && rows.head.getLong(0) === 2L,
        s"late row not dropped: ${rows.mkString}")
    } finally query.stop()
  }

  test("dropDuplicatesWithinWatermark emits each event_id once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:${min}%02d:00")
    val stream = MemoryStream[Ev]
    val query = Streams.streamingDedup(stream.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      stream.addData(Ev(1, t(0), 1, "click", 1.0), Ev(2, t(1), 1, "view", 1.0))
      query.processAllAvailable()
      stream.addData(Ev(1, t(2), 1, "click", 1.0)) // duplicate id within horizon
      query.processAllAvailable()
      val n = spark.table("dedup").count()
      assert(n === 2, s"expected 2 unique events, got $n")
    } finally query.stop()
  }

  test("throttle batch: per-key greedy walk replays against the LAST KEPT event (r9)") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ttlUs = 72L * 3600L * 1000000L
    val got = Streams.throttleBatch(Tables.events(spark, sfDir)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val raw = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expect = raw.groupBy(e => (e._1, e._2)).toSeq.flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._4, e._3))
      var lastKept = Long.MinValue
      sorted.filter { e =>
        val keep = lastKept == Long.MinValue || e._4 - lastKept >= ttlUs
        if (keep) lastKept = e._4
        keep
      }
    }.sortBy(e => (e._1, e._2, e._4, e._3))
    assert(got.toSeq === expect.toSeq)
    // throttle contract: kept events per key are >= ttl apart, and the
    // walk actually drops something (non-vacuous fixture)
    got.groupBy(e => (e._1, e._2)).values.foreach { ks =>
      ks.map(_._4).sorted.sliding(2).foreach {
        case Array(a, b) => assert(b - a >= ttlUs, "kept events closer than ttl")
        case _ =>
      }
    }
    assert(got.length < raw.length, "throttle kept everything — vacuous fixture")
  }

  test("flatMapGroupsWithState accumulates per-user state across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, Double)]
    val query = Streams.flatMapUserStats(stream.toDS())
      .writeStream.format("memory").queryName("fmgs").outputMode("append").start()
    try {
      stream.addData((1L, 5.0), (1L, 3.0), (2L, 7.0))
      query.processAllAvailable()
      stream.addData((1L, 10.0)) // new peak for user 1
      query.processAllAvailable()
      stream.addData((1L, 1.0)) // not a peak
      query.processAllAvailable()
      val rows = spark.table("fmgs").orderBy("n_events", "user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      assert(rows.contains((1L, 2L, 8.0, true)))   // batch 1: two events, peak 5
      assert(rows.contains((2L, 1L, 7.0, true)))
      assert(rows.contains((1L, 3L, 18.0, true)))  // batch 2: peak 10
      assert(rows.contains((1L, 4L, 19.0, false))) // batch 3: 1.0 is no peak
    } finally query.stop()
  }

  test("transformWithState accumulates typed ValueState on RocksDB") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the operator REQUIRES the RocksDB state store; scope the provider
    // override to this query and restore the default afterwards
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[(Long, Double)]
    val query = Streams.transformWithStateTotals(stream.toDS())
      .writeStream.format("memory").queryName("tws").outputMode("append").start()
    try {
      stream.addData((1L, 5.25), (1L, 3.10), (2L, 7.00))
      query.processAllAvailable()
      stream.addData((1L, 10.01), (2L, 0.99))
      query.processAllAvailable()
      val rows = spark.table("tws")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows.contains((1L, 2L, 835L)))   // batch 1: 5.25+3.10 in cents
      assert(rows.contains((2L, 1L, 700L)))
      assert(rows.contains((1L, 3L, 1836L)))  // state carried across batches
      assert(rows.contains((2L, 2L, 799L)))
    } finally {
      query.stop()
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("throttle batch: pre-epoch (negative-µs) events replay the same greedy walk (r10)") {
    // the ADVICE finding: a -1 'nothing kept yet' sentinel breaks on
    // negative epoch-µs — after keeping a pre-1970 event, every later
    // event would be kept regardless of TTL. Explicit started-flag law:
    // t=-100h kept, t=-50h dropped (50h < 72h TTL), t=0h dropped
    // (100h-from-kept... no: vs last KEPT at -100h → 100h ≥ 72h KEPT),
    // t=+30h dropped (30h since the +0h keep).
    import spark.implicits._
    def ts(h: Long) = new Timestamp(h * 3600L * 1000L)
    val evs = Seq(
      (1L, ts(-100), 7L, "alert", 0.0),
      (2L, ts(-50), 7L, "alert", 0.0),
      (3L, ts(0), 7L, "alert", 0.0),
      (4L, ts(30), 7L, "alert", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val kept = Streams.throttleBatch(evs).select("event_id").collect().map(_.getLong(0))
    assert(kept.toSeq === Seq(1L, 3L),
      s"pre-epoch greedy walk wrong: kept ${kept.mkString(",")}")
  }

  test("streaming throttle: out-of-order chunks converge to the batch greedy walk (r10)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamingThrottle
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // fixture events in ts order, then disorder WITHIN 150-event blocks
    // (~4.5 days of fixture time — inside the 10-day watermark delay, so
    // every decision the processor takes is watermark-final)
    val evs = loadEvents()
    val rnd = new scala.util.Random(7)
    val scrambled = evs.grouped(150).flatMap(b => rnd.shuffle(b)).toSeq
    val stream = MemoryStream[Ev]
    val query = StreamingThrottle.kept(stream.toDF(), ttlHours = 72, delay = "10 days")
      .writeStream.format("memory").queryName("thr").outputMode("append").start()
    try {
      scrambled.grouped(220).foreach { chunk =>
        stream.addData(chunk); query.processAllAvailable()
      }
      // flush: a far-future sentinel advances the watermark past every
      // real event; the pending-tail timers fire on the watermark batch
      val sentinelTs = Timestamp.valueOf("2024-06-01 00:00:00")
      stream.addData(Ev(-1L, sentinelTs, -99L, "zz_sentinel", 0.0))
      query.processAllAvailable()
      val streamed = spark.table("thr")
        .filter(col("user_id") =!= -99L)
        .select("user_id", "event_type", "event_id", "ts_us")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(identity).toSeq
      val batch = Streams.throttleBatch(Tables.events(spark, sfDir)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(identity).toSeq
      assert(streamed.size === batch.size,
        s"streamed kept ${streamed.size} vs batch ${batch.size}")
      assert(streamed === batch)
      assert(batch.size < evs.size, "throttle kept everything — vacuous fixture")
    } finally {
      query.stop()
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("streaming throttle: convergence holds across randomized disorder seeds and chunkings (r12)") {
    // the r10 gate fixes one (seed, block, chunk) schedule; this sweep
    // randomizes all three so the timer-reconciliation machinery (r12 —
    // stale-timer deletion per drain) is gated against arrival orders
    // it did not grow up with. Any schedule whose disorder stays inside
    // the watermark delay must replay the exact batch greedy walk.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamingThrottle
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val evs = loadEvents()
    val batch = Streams.throttleBatch(Tables.events(spark, sfDir)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
    try {
      for ((seed, block, chunk) <- Seq((101, 90, 333), (202, 250, 170), (303, 40, 77))) {
        val rnd = new scala.util.Random(seed)
        val scrambled = evs.grouped(block).flatMap(b => rnd.shuffle(b)).toSeq
        val stream = MemoryStream[Ev]
        val qn = s"thr_rand_$seed"
        val query = StreamingThrottle.kept(stream.toDF(), ttlHours = 72, delay = "10 days")
          .writeStream.format("memory").queryName(qn).outputMode("append").start()
        try {
          scrambled.grouped(chunk).foreach { c =>
            stream.addData(c); query.processAllAvailable()
          }
          stream.addData(Ev(-1L, Timestamp.valueOf("2024-06-01 00:00:00"), -99L, "zz_sentinel", 0.0))
          query.processAllAvailable()
          val streamed = spark.table(qn)
            .filter(col("user_id") =!= -99L)
            .select("user_id", "event_type", "event_id", "ts_us")
            .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
            .sortBy(identity).toSeq
          assert(streamed === batch,
            s"schedule (seed=$seed, block=$block, chunk=$chunk) diverged from the batch walk")
        } finally query.stop()
      }
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("streaming throttle: pre-epoch events are REFUSED loudly, not silently diverged (r11)") {
    // the batch form supports negative epoch-µs (gated above); the
    // streaming twin CANNOT — Spark's initial watermark is 0 ms, so a
    // late pre-epoch arrival would be dropped before the processor and
    // convergence would break SILENTLY. The documented contract is a
    // loud refusal folded into the ts value path; this gate replays the
    // batch test's pre-epoch fixture through the watermark path and
    // demands the refusal, not a wrong answer.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamingThrottle
    def ts(h: Long) = new Timestamp(h * 3600L * 1000L)
    val stream = MemoryStream[Ev]
    val query = StreamingThrottle.kept(stream.toDF(), ttlHours = 72, delay = "10 days")
      .writeStream.format("memory").queryName("thr_pre").outputMode("append").start()
    try {
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        stream.addData(
          Ev(1L, ts(-100), 7L, "alert", 0.0), Ev(2L, ts(-50), 7L, "alert", 0.0),
          Ev(3L, ts(0), 7L, "alert", 0.0), Ev(4L, ts(30), 7L, "alert", 0.0))
        query.processAllAvailable()
      }
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
          .map(e => Option(e.getMessage).getOrElse("")).toSeq
      assert(chain(ex).exists(_.contains("pre-epoch")),
        s"expected the pre-epoch refusal, got: ${chain(ex).mkString(" | ")}")
    } finally query.stop()
  }

  test("streaming throttle: idle-key eviction is output-identical across the eviction horizon (r11)") {
    // the event-time cleanup timer clears a key's (started, last_kept)
    // scalar once the watermark passes last_kept + ttl with an empty
    // buffer. This schedule FORCES that path for key 7 — key 8's late
    // events drag the watermark far past key 7's eviction horizon
    // before key 7 speaks again — and then demands the post-eviction
    // walk equals the batch greedy walk on the same events.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamingThrottle
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def ts(h: Long) = new Timestamp(1704067200000L + h * 3600L * 1000L)
    val chunk1 = Seq(Ev(1L, ts(0), 7L, "alert", 0.0))          // key 7: kept, then idle
    val chunk2 = Seq(Ev(2L, ts(200), 8L, "alert", 0.0))        // wm -> ~199h >> 0h+72h: key 7 evicts
    val chunk3 = Seq(Ev(3L, ts(210), 7L, "alert", 0.0),        // key 7 fresh state: kept (210-0 >= 72 too)
                     Ev(4L, ts(220), 7L, "alert", 0.0))        // 10h since 210h keep: dropped
    val sentinel = Ev(-1L, ts(10000), -99L, "zz_sentinel", 0.0)
    val all = (chunk1 ++ chunk2 ++ chunk3)
      .map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val stream = MemoryStream[Ev]
    val query = StreamingThrottle.kept(stream.toDF(), ttlHours = 72, delay = "1 hour")
      .writeStream.format("memory").queryName("thr_evict").outputMode("append").start()
    try {
      // the output-identity assertion below holds BY DESIGN whether or
      // not eviction ever fires (that is the point of the eviction law),
      // so it cannot catch a regression that silently stops evicting —
      // a state leak (the r11 ADVICE finding). The store metrics close
      // that hole: numRowsTotal after each chunk settles is the key's
      // actual footprint, and it must DROP when the watermark crosses an
      // idle key's horizon.
      def stateRows(): Long = query.lastProgress.stateOperators(0).numRowsTotal
      val totals = Seq(chunk1, chunk2, chunk3, Seq(sentinel)).map { c =>
        stream.addData(c); query.processAllAvailable(); stateRows()
      }
      val streamed = spark.table("thr_evict").filter(col("user_id") =!= -99L)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      val batch = Streams.throttleBatch(all).select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(streamed === batch)
      assert(batch === Seq(1L, 2L, 3L)) // the schedule is non-vacuous: one drop
      // after chunk2 the watermark (~199h) is past key 7's horizon
      // (0h + 72h): key 7's scalar must be GONE, leaving key 8 alone —
      // an unevicted leak would read 2 here
      assert(totals(1) === 1L,
        s"key 7 not evicted after its horizon: state rows ${totals(1)} (want 1)")
      // the sentinel flush (wm ~10000h) crosses key 7's AND key 8's
      // horizons: only the sentinel key's scalar may remain
      assert(totals(3) === 1L,
        s"idle keys not evicted at the final watermark: state rows ${totals(3)} (want 1)")
      // and eviction must show as actual row REMOVAL in the store
      // metrics, not just a stable total masking add/remove churn
      assert(query.recentProgress.exists(
        _.stateOperators.exists(_.numRowsRemoved > 0)),
        "no batch ever reported numRowsRemoved > 0 — eviction never fired")
    } finally {
      query.stop()
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("streaming CDC: out-of-order chunked changelog converges to the batch compaction") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamingCdc
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the batch fixture changelog, price in integer cents, arrival order
    // SCRAMBLED (descending seq, interleaved keys) and split into chunks
    val log = graft.sync.Cdc.changelog(Tables.orders(spark, sfDir))
      .select(col("key"), col("seq"), col("op"),
        coalesce(col("price_cents"), lit(-1L)).as("cents"),
        coalesce(col("status"), lit("")).as("status"))
      .orderBy(col("seq").desc, col("key").asc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getString(4)))
    val stream = MemoryStream[StreamingCdc.CdcRow]
    val query = StreamingCdc.latestState(stream.toDS())
      .writeStream.format("memory").queryName("cdc_state").outputMode("append").start()
    try {
      log.grouped(math.max(1, log.length / 3)).foreach { chunk =>
        stream.addData(chunk.toSeq)
        query.processAllAvailable()
      }
      // final state per key = the max-seq emission across all batches
      val streamed = spark.table("cdc_state")
        .groupBy("key").agg(
          max_by(struct(col("last_seq"), col("op"), col("price_cents"), col("status")),
            col("last_seq")).as("s"))
        .select(col("key"), col("s.last_seq"), col("s.op"),
          col("s.price_cents"), col("s.status"))
      val expected = graft.sync.Cdc.compactAll(
          graft.sync.Cdc.changelog(Tables.orders(spark, sfDir)))
        .select(col("key"), col("last_seq"), col("last_op").as("op"),
          coalesce(col("price_cents"), lit(-1L)).as("price_cents"),
          coalesce(col("status"), lit("")).as("status"))
      assert(streamed.exceptAll(expected).count() === 0L)
      assert(expected.exceptAll(streamed).count() === 0L)
    } finally {
      query.stop()
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("streaming near-dup: incoming docs matched against the persisted band index") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_neardup").toString
    // two real corpus texts; long ones, so a small appended tail keeps
    // Jaccard (and the band-collision probability) high
    val texts = Tables.documents(spark, sfDir).filter(col("n_chars") > 400)
      .orderBy("doc_id").limit(2).collect().map(_.getAs[String]("text"))
    val stream = MemoryStream[(Long, String)]
    val query = graft.streaming.StreamingNearDup.indexAndMatch(
      stream.toDF().toDF("doc_id", "text"), s"$dir/index", s"$dir/matches")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      // batch 1: seed the index with two distinct docs — no matches yet
      stream.addData((1L, texts(0)), (2L, texts(1)))
      query.processAllAvailable()
      assert(graft.streaming.StreamingNearDup.matches(spark, s"$dir/matches")
        .forall(_.isEmpty))
      // batch 2: an exact recrawl of doc 1 (guaranteed band hit), a
      // near-copy of doc 2 (tail appended), and an unrelated doc
      stream.addData((3L, texts(0)), (5L, texts(1) + " near dup tail"),
        (4L, texts(1).reverse))
      query.processAllAvailable()
      val m = graft.streaming.StreamingNearDup.matches(spark, s"$dir/matches").get
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(m.contains((3L, 1L)), s"exact recrawl must hit the index, got $m")
      assert(m.contains((5L, 2L)), s"near-copy must hit the index, got $m")
      assert(!m.exists(_._1 == 4L), s"unrelated doc must not match, got $m")
      // batch 3: two near-copies arriving TOGETHER — the self-probe must
      // pair them (larger doc_id probes smaller) even though neither was
      // indexed when the batch started; both must also hit the index
      stream.addData((6L, texts(0)), (7L, texts(0) + " same batch twin"))
      query.processAllAvailable()
      val m3 = graft.streaming.StreamingNearDup.matches(spark, s"$dir/matches").get
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(m3.contains((7L, 6L)), s"same-batch near-dup pair must be found, got $m3")
      assert(m3.contains((6L, 1L)), s"batch-3 doc must still hit the index, got $m3")
      assert(!m3.contains((6L, 7L)), s"only the smaller id plays index side, got $m3")
      // the index is batch_id-partitioned (the replay-idempotence contract:
      // a re-run overwrites its own partition instead of appending)
      val idxCols = spark.read.parquet(s"$dir/index").columns.toSet
      assert(idxCols("batch_id"), s"index must be batch_id-partitioned, got $idxCols")
    } finally query.stop()
  }

  test("streaming heavy hitters: per-group sketch state tracks top items across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[(Long, String)]
    val query = graft.streaming.StreamingHeavyHitters.topItems(stream.toDS(), k = 2)
      .writeStream.format("memory").queryName("hh").outputMode("update").start()
    try {
      stream.addData((1L, "x"), (1L, "x"), (1L, "y"), (2L, "z"))
      query.processAllAvailable()
      stream.addData((1L, "y"), (1L, "y"), (1L, "y"))
      query.processAllAvailable()
      val rows = spark.table("hh")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
      assert(rows.contains((1L, 1, "x", 2L)), s"batch 1 top: x=2, got $rows")
      // after batch 2 the sketch carried x=2 forward and y reached 4
      assert(rows.contains((1L, 1, "y", 4L)), s"batch 2 top: y=4, got $rows")
      assert(rows.contains((1L, 2, "x", 2L)), s"x retained at rank 2, got $rows")
      assert(rows.contains((2L, 1, "z", 1L)))
    } finally {
      query.stop()
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("streaming funnel stages over ordered chunks == batch funnel summary") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // a pre-epoch (negative-µs) user: a sign-test "unset" sentinel would
    // silently zero this funnel; the batch operator must agree it converts
    val preEpoch = Seq(
      Ev(-1L, new Timestamp(-5000L), 999999L, "view", 0.0),
      Ev(-2L, new Timestamp(-4000L), 999999L, "click", 0.0),
      Ev(-3L, new Timestamp(-3000L), 999999L, "purchase", 0.0))
    val evs = preEpoch ++ loadEvents().take(4000)
    // full-precision event time: transformWithState compares µs exactly
    // as the batch operator compares timestamps
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val fevs = evs.map(e =>
      graft.streaming.StreamingFunnel.FunnelEv(e.user_id, e.event_type, us(e.ts)))
    val stream = MemoryStream[graft.streaming.StreamingFunnel.FunnelEv]
    val query = graft.streaming.StreamingFunnel.stages(stream.toDS())
      .writeStream.format("memory").queryName("funnel").outputMode("update").start()
    try {
      fevs.grouped(1500).foreach { chunk =>
        stream.addData(chunk); query.processAllAvailable()
      }
      // latest stage per user (stage is monotone, so max == final)
      val reach = spark.table("funnel")
        .groupBy($"user_id").agg(max($"stage").as("stage"))
        .agg(count(when($"stage" >= 1, 1)).as("u1"),
          count(when($"stage" >= 2, 1)).as("u2"),
          count(when($"stage" >= 3, 1)).as("u3"))
        .collect().head
      val batch = ops.Behavior.funnelSteps(evs.toDF())
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      assert(reach.getLong(0) === batch(1), s"step-1 reach: $reach vs $batch")
      assert(reach.getLong(1) === batch(2), s"step-2 reach: $reach vs $batch")
      assert(reach.getLong(2) === batch(3), s"step-3 reach: $reach vs $batch")
      assert(batch(3) > 0, "fixture must exercise the full funnel")
    } finally {
      query.stop()
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("streaming attribution over ordered chunks == batch channel rollup (r8)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val evs = loadEvents().take(5000)
    def us(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    val aevs = evs.map(e => graft.streaming.StreamingAttribution.AttrEv(
      e.user_id, e.event_type, us(e.ts), e.event_id, e.value))
    val stream = MemoryStream[graft.streaming.StreamingAttribution.AttrEv]
    val query = graft.streaming.StreamingAttribution.attributions(stream.toDS())
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      aevs.grouped(1700).foreach { chunk =>
        stream.addData(chunk); query.processAllAvailable()
      }
      val rows = spark.table("attr").collect()
        .map(r => (r.getString(1), r.getDouble(2), r.getLong(3)))
      // roll up per channel exactly like the batch operator: count,
      // decimal(18,2)-accumulated value, exact µs lag total (direct = none)
      val got = rows.groupBy(_._1).map { case (ch, rs) =>
        ch -> ((rs.size.toLong,
          rs.map(r => BigDecimal(r._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble,
          if (ch == "direct") None else Some(rs.map(_._3).sum)))
      }
      val batch = ops.Behavior.lastTouchAttribution(evs.toDF()).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
      assert(got === batch, "stream attribution diverged from batch")
      assert(got.keySet === Set("view", "click", "direct"))
    } finally {
      query.stop()
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("watermarked stream-stream join matches the batch join") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val evs = loadEvents().take(3000)
    val sStream = MemoryStream[Ev]
    val pStream = MemoryStream[Ev]
    val joined = Streams.streamStreamJoin(
      sStream.toDF().filter(col("event_type") === "signup"),
      pStream.toDF().filter(col("event_type") === "purchase"))
    val query = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      evs.grouped(1000).foreach { c =>
        sStream.addData(c); pStream.addData(c); query.processAllAvailable()
      }
      // flush watermarks far forward so all joinable pairs are emitted
      val flush = Ev(-1, new Timestamp(evs.map(_.ts.getTime).max + 24 * 3600 * 1000L),
        999999L, "flush", 0.0)
      sStream.addData(flush); pStream.addData(flush); query.processAllAvailable()

      val streamed = spark.table("ssj")
        .select("s_id", "p_id").orderBy("s_id", "p_id").collect().toSeq
      val df = evs.toDF()
      val batch = Streams.streamStreamJoin(
          df.filter(col("event_type") === "signup"),
          df.filter(col("event_type") === "purchase"))
        .select("s_id", "p_id").orderBy("s_id", "p_id").collect().toSeq
      assert(streamed === batch)
    } finally query.stop()
  }

  test("streaming session windows finalize to the batch lag-gap sessions") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val evs = loadEvents().take(2000)
    val flushTs = new Timestamp(evs.map(_.ts.getTime).max + 6 * 3600 * 1000L)
    val stream = MemoryStream[Ev]
    val query = Streams.streamingSessions(stream.toDF())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      evs.grouped(700).foreach { c => stream.addData(c); query.processAllAvailable() }
      stream.addData(Ev(-1, flushTs, 999999L, "flush", 0.0))
      query.processAllAvailable()
      val streamed = spark.table("sess")
        .filter(col("user_id") =!= 999999L)
        .select(col("user_id"), unix_micros(col("s_start")).as("start_us"), col("n_events"))
        .orderBy("user_id", "start_us").collect().toSeq
      import spark.implicits._
      val batch = Streams.sessionBatch(evs.toDF())
        .select(col("user_id"), col("start_us"), col("n_events"))
        .orderBy("user_id", "start_us").collect().toSeq
      assert(streamed === batch)
    } finally query.stop()
  }

  test("streaming decontamination: leaked docs flagged against the static eval gram set") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
    // the static probe side, computed once (the ingest-guard deployment shape)
    val evalG = graft.llm.TrainingPrep.evalGramSet(docs).localCheckpoint()
    def split(id: Long): String = refSplit(id)
    val leak = docs.select("doc_id", "text").collect()
      .find(r => split(r.getLong(0)) == "test" && r.getString(1).split(" ").length >= 13)
      .get.getString(1)
    val stream = MemoryStream[(Long, String)]
    val query = graft.streaming.StreamingDecontam.flag(
        stream.toDF().toDF("doc_id", "text"), evalG)
      .writeStream.format("memory").queryName("decontam_flags")
      .outputMode("append").start()
    try {
      // batch 1: a full eval-doc leak + a sub-13-token clean doc
      stream.addData((900001L, leak), (900002L, "completely clean unrelated words only"))
      query.processAllAvailable()
      assert(spark.table("decontam_flags").collect().map(_.getLong(0)).toSet
        === Set(900001L))
      // batch 2: a PARTIAL copy (just the first 13 tokens) must still
      // flag — the per-gram rule catches what exact-hash misses; a tiny
      // clean doc passes; 900001 is not re-emitted (append-once dedup)
      val partial = leak.split(" ").take(13).mkString(" ")
      stream.addData((900003L, partial), (900004L, "tiny"))
      query.processAllAvailable()
      assert(spark.table("decontam_flags").collect().map(_.getLong(0)).toSet
        === Set(900001L, 900003L))
    } finally query.stop()
  }

  test("streaming quantile histogram over chunks == batch tier; read-off matches rollup") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val orders = Tables.orders(spark, sfDir)
    val rows = orders.select("o_orderkey", "o_totalprice").orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val stream = MemoryStream[(Long, Double)]
    val query = graft.streaming.StreamingQuantile.bucketCounts(
        stream.toDF().toDF("o_orderkey", "o_totalprice"))
      .writeStream.format("memory").queryName("qhist").outputMode("complete").start()
    try {
      rows.grouped(math.max(1, rows.size / 4)).foreach { chunk =>
        stream.addData(chunk); query.processAllAvailable()
      }
      // final streaming state == the batch histogram, bucket for bucket
      val streamed = spark.table("qhist").orderBy("bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val batch = graft.ops.Aggregates.centsHist(orders).orderBy("bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(streamed === batch, "streaming histogram state diverged from batch tier")
      // percentile read-off from the state == the batch rollup's answer
      val fromState = graft.streaming.StreamingQuantile
        .quantilesFromState(spark.table("qhist")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val rollup = graft.ops.Aggregates.quantileRollup(orders).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(fromState === rollup, "state read-off diverged from batch rollup")
      // streaming DRIFT MONITORING falls out of the same state: the
      // running histogram feeds driftPsiFromHists against a stored
      // baseline epoch, and must equal the batch monitor exactly
      val baseline = graft.sync.Snapshots.perturbedOrders(orders)
      val hBase = spark.table(
        graft.ops.Aggregates.ensureQuantileHist(spark, baseline, epoch = 31L))
      val viaStream = graft.ops.DataQuality
        .driftPsiFromHists(hBase, spark.table("qhist"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val viaBatch = graft.ops.DataQuality.driftPsi(baseline, orders)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(viaStream === viaBatch, "streaming-state PSI diverged from the batch monitor")
    } finally query.stop()
  }

  test("late-event accounting matches a driver-side replay of the min-across-shards watermark (r8)") {
    val ev = Tables.events(spark, sfDir)
    val got = Streams.lateEventsBatch(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // replay: per (shard, batch) max event time, per-shard running max
    // over STRICTLY EARLIER batches, global watermark = min over shards
    val rows = ev.select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val busUs = 1800L * 1000000L
    def batchOf(us: Long, id: Long): Long = Math.floorDiv(us + (id % 97) * 60000000L, busUs)
    val byShardBatch = rows.groupBy { case (_, us, id) => (id % 4, batchOf(us, id)) }
      .map { case (k, es) => k -> es.map(_._2).max }
    val batches = byShardBatch.keySet.map(_._2).toSeq.sorted
    val wm: Map[Long, Option[Long]] = batches.map { b =>
      val perShard = (0L until 4L).map { s =>
        val seen = byShardBatch.collect { case ((sh, bb), mx) if sh == s && bb < b => mx }
        if (seen.isEmpty) None else Some(seen.max)
      }
      b -> (if (perShard.forall(_.isDefined)) Some(perShard.flatten.min) else None)
    }.toMap
    val expect = rows.groupBy(_._1).map { case (tpe, es) =>
      val late = es.count { case (_, us, id) =>
        wm(batchOf(us, id)).exists(w => us < w - busUs) }
      tpe -> (es.length.toLong, late.toLong)
    }
    assert(got === expect, s"late accounting diverged: got $got expect $expect")
    // non-triviality holds once batches are populated (sf0.01: ~12%
    // late, oracle-checked); at the spec's sf0.001 the stream is so
    // sparse the watermark never catches an event — only the exactness
    // law applies there
    if (rows.length >= 5000)
      assert(got.values.map(_._2).sum > 0, "jitter fixture produced no late events")
    got.values.foreach { case (n, l) => assert(l < n) }
  }
}
