package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time windowed aggregations, written once against the unified
  * DataFrame API so the SAME transformation runs in batch (oracle-checked)
  * and under Structured Streaming (chunk-equivalence-checked in
  * StreamingSpec with a watermark).
  *
  * Scale notes: tumbling/sliding aggs shuffle once on (window, key) with
  * map-side partial aggregation; state size under streaming is
  * |open windows × keys| and the watermark bounds "open". The session
  * window's batch form needs a per-user sort (one shuffle on user_id);
  * the streaming form uses Spark's native session_window state merging.
  */
object Streams {

  /** 1-hour tumbling event-time windows per event_type: count + exact
    * decimal sum. Works identically on a batch DF or a stream (add
    * watermark upstream for streaming). */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Batch query wrapper with deterministic order. */
  def tumblingBatch(events: DataFrame): DataFrame =
    tumblingAgg(events).orderBy("w_start", "event_type")

  /** 1-hour windows sliding every 30 minutes: each event lands in exactly
    * two windows. */
  def slidingBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** Stream-static enrichment: the event stream joined to a static
    * customer dimension (user_id = c_custkey), aggregated per
    * (segment, event_type). In Structured Streaming the static side is
    * broadcast and re-resolved per micro-batch — the canonical pattern for
    * enriching a stream with a slowly-changing dim without any stream
    * state. The SAME transformation runs in batch (oracle-checked) and
    * streaming (StreamingSpec chunk-equivalence). */
  def enrichAgg(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Batch query wrapper with deterministic order. */
  def enrichBatch(events: DataFrame, customer: DataFrame): DataFrame =
    enrichAgg(events, customer).orderBy("c_mktsegment", "event_type")

  /** Batch-equivalent session windows (30-minute gap) per user: lag-gap →
    * cumulative session id → per-session stats. Timestamp math in integer
    * microseconds for exact cross-engine parity. */
  def sessionBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val byUser = Window.partitionBy("user_id").orderBy("ts_us")
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("new_session",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapUs, 1L)
          .when(lag(col("ts_us"), 1).over(byUser).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** WATERMARK ACCOUNTING in batch (r8) — how many events WOULD a
    * streaming run drop as late, per type? The answer decides the
    * watermark delay a production stream can afford, and it is
    * computable exactly in batch because Structured Streaming's
    * watermark is deterministic given arrival order: the global
    * watermark before micro-batch b is `min` over source partitions of
    * the max EVENT TIME that partition saw in batches < b, minus the
    * delay — the min-across-partitions is the part naive models skip.
    *
    * Arrival fixture (the interpolate-dropout discipline): the
    * synthetic stream arrives in perfect event-time order, where every
    * watermark answer is trivially zero, so arrival time is perturbed
    * by a deterministic per-event network jitter of `(event_id mod 97)`
    * minutes; micro-batches are `batchSeconds` arrival-time slots and
    * the source partition is `event_id mod nShards`.
    *
    * Scale shape: one (shard, batch) max aggregate over the facts, the
    * running-max window runs on the BATCH-GRID frame (batches ×
    * shards — event-volume-free, no partition-less window on facts),
    * watermark joins back via broadcast. */
  def lateEventsBatch(events: DataFrame, batchSeconds: Long = 1800,
                      delaySeconds: Long = 1800, nShards: Int = 4): DataFrame = {
    val busUs = batchSeconds * 1000000L
    val delayUs = delaySeconds * 1000000L
    val e = events.select(col("event_type"),
      unix_micros(col("ts")).as("ts_us"),
      (col("event_id") % nShards).cast("long").as("shard"),
      expr(s"(unix_micros(ts) + (event_id % 97) * 60000000) div $busUs")
        .as("batch_id"))
    val bm = e.groupBy("shard", "batch_id").agg(max(col("ts_us")).as("bmax"))
    val grid = e.select("batch_id").distinct()
      .crossJoin(broadcast(
        events.sparkSession.range(nShards).select(col("id").as("shard"))))
    val wShard = Window.partitionBy("shard").orderBy("batch_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // a shard that has seen nothing yet holds the GLOBAL watermark back
    // (count(rmax) < nShards → undefined → nothing is late): faithful
    // to the engine's min-across-partitions rule
    val wm = grid.join(bm, Seq("shard", "batch_id"), "left_outer")
      .withColumn("rmax", max(col("bmax")).over(wShard))
      .groupBy("batch_id")
      .agg(when(count(col("rmax")) === nShards, min(col("rmax"))).as("wm_us"))
    e.join(broadcast(wm), "batch_id")
      .withColumn("late",
        (col("wm_us").isNotNull && col("ts_us") < col("wm_us") - lit(delayUs))
          .cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("late")).as("late_n"))
      .select(col("event_type"), col("n"), col("late_n"),
        graft.ops.Det.rfloor(
          col("late_n").cast("double") / col("n").cast("double"), 4)
          .as("late_ratio"))
      .orderBy("event_type")
  }

  /** Streaming tumbling agg with watermark — late rows beyond `delay` are
    * dropped and their windows finalized (append mode emits a window only
    * once its watermark passes). */
  def streamingTumbling(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    tumblingAgg(events.withWatermark("ts", delay))

  /** Streaming session windows via the native session_window state. */
  def streamingSessions(events: DataFrame, gap: String = "30 minutes",
                        delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n_events"))

  /** Streaming dedup within the watermark horizon — the streaming form of
    * exact dedup (state = keys seen inside the horizon, pruned as the
    * watermark advances; unbounded-state-free). */
  def streamingDedup(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** KEYED THROTTLE replayed exactly in batch (r9) — the rate-limiter
    * every notification/alerting stream runs as stateful
    * mapGroupsWithState ("at most one delivery per key per TTL"): per
    * (user, event_type) in (event time, id) order, keep the first
    * event, then each event at least `ttl` after the LAST KEPT one.
    * The recurrence depends on the last KEPT element — not the previous
    * row — so no window/lag form expresses it; it is a linear scan per
    * key, exactly the state a streaming throttle carries (one timestamp
    * per key — bounded, with the TTL itself as the eviction story).
    *
    * Batch realization: per-key sorted array + a codegen'd `aggregate`
    * HOF carrying (started, last_kept, kept[]) — the holtLinear
    * per-series-scan discipline; per-key state is bounded by
    * events-per-key (the sessionBatch grain). All comparisons in
    * integer µs. "Nothing kept yet" is an EXPLICIT boolean, not a
    * timestamp sentinel: a `-1` sentinel overloads the timestamp
    * domain and breaks on pre-1970 (negative epoch-µs) events, where
    * the oracle's sentinel-free recursion is correct. The oracle is
    * a rn+1 recursive CTE threading the same last-kept state (the holt
    * recursion shape) — both sides replay the identical greedy walk.
    *
    * Scale: one hash exchange to the key grain (map-side collect_list
    * partials), then per-row HOF work — no iteration, no driver state;
    * key cardinality bounds memory exactly as the streaming twin's
    * state store does. */
  def throttleBatch(events: DataFrame, ttlHours: Int = 72): DataFrame = {
    val ttlUs = ttlHours * 3600L * 1000000L
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .groupBy("user_id", "event_type")
      .agg(array_sort(collect_list(struct(col("ts_us"), col("event_id")))).as("evs"))
      .select(col("user_id"), col("event_type"),
        explode(expr(
          s"""aggregate(evs,
             |  named_struct('started', false, 'last_us', cast(0 as bigint),
             |    'kept', cast(array() as array<struct<ts_us: bigint, event_id: bigint>>)),
             |  (acc, e) -> IF(NOT acc.started OR e.ts_us - acc.last_us >= $ttlUs,
             |    named_struct('started', true, 'last_us', e.ts_us,
             |      'kept', array_append(acc.kept, e)),
             |    acc),
             |  acc -> acc.kept)""".stripMargin)).as("e"))
      .select(col("user_id"), col("event_type"),
        col("e.event_id").as("event_id"), col("e.ts_us").as("ts_us"))
      .orderBy("user_id", "event_type", "ts_us", "event_id")
  }

  /** Per-user running state for [[flatMapUserStats]]. */
  final case class UserState(nEvents: Long, sumValue: Double, maxValue: Double)
  final case class UserUpdate(user_id: Long, n_events: Long, sum_value: Double,
                              new_peak: Boolean)

  /** Custom streaming state via flatMapGroupsWithState: per-user running
    * count/sum plus a "new peak value" flag per batch — the arbitrary-
    * state API for logic windows/aggs can't express. State is one small
    * case class per ACTIVE user; pass an idle `timeout` (e.g.
    * ProcessingTimeTimeout) in production so idle users' state expires
    * instead of growing forever — the 100 TB rule: every state handle
    * needs an eviction story. (Default NoTimeout: under MemoryStream
    * test harnesses a processing-time timeout re-triggers empty batches
    * in a tight loop.) Input rows are typed
    * (user_id, value, sorted-within-group not required — peak/sum are
    * order-free so retries can't change the result). */
  def flatMapUserStats(events: Dataset[(Long, Double)],
                       timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
      : Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserState, UserUpdate](OutputMode.Append, timeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption.getOrElse(UserState(0L, 0.0, Double.NegativeInfinity))
            var n = prev.nEvents
            var sum = prev.sumValue
            var mx = prev.maxValue
            rows.foreach { case (_, v) => n += 1; sum += v; if (v > mx) mx = v }
            state.update(UserState(n, sum, mx))
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration("1 hour")
            Iterator.single(UserUpdate(user, n, sum, mx > prev.maxValue))
          }
      }
  }

  /** Output row of [[transformWithStateTotals]]. */
  final case class UserTotals(user_id: Long, n_events: Long, sum_cents: Long)

  /** Per-user running totals via Spark 4's `transformWithState` — the
    * successor of flatMapGroupsWithState: typed named state handles
    * (ValueState/ListState/MapState), per-state TTL, timers, and the
    * RocksDB state store (required by the operator; state spills to disk
    * instead of living on the executor heap — the 100 TB state story).
    * Sum kept in integer cents so retries/merge order can't change it.
    * TTLConfig.NONE here because the MemoryStream harness has no
    * processing-time progression; production sets a TTL so idle users'
    * state expires (same eviction doctrine as [[flatMapUserStats]]). */
  class UserTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Double), UserTotals] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)](
        "totals", E.tuple(E.scalaLong, E.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
                                 timerValues: TimerValues): Iterator[UserTotals] = {
      var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, v) => n += 1; cents += math.round(v * 100) }
      totals.update((n, cents))
      Iterator.single(UserTotals(key, n, cents))
    }
  }

  /** Wire [[UserTotalsProcessor]] over a (user_id, value) stream. */
  def transformWithStateTotals(events: Dataset[(Long, Double)]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_._1)
      .transformWithState(new UserTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Watermarked stream-stream join: signups joined to purchases of the
    * same user within [0, 30 min] after the signup. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * state for either side is dropped once the watermark passes its
    * horizon — the only way a stream-stream join stays bounded. */
  def streamStreamJoin(signups: DataFrame, purchases: DataFrame,
                       delay: String = "10 minutes"): DataFrame = {
    val s = signups.withWatermark("ts", delay)
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"), col("event_id").as("s_id"))
    val p = purchases.withWatermark("ts", delay)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"), col("value"))
    s.join(p,
      col("s_user") === col("p_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 30 MINUTES"))
  }

  /** Name of the manifest file that points at the live snapshot dir. */
  private val ManifestName = "_CURRENT"

  private def snapDirName(batchId: Long): String = f"snap-$batchId%012d"

  /** Resolve the live snapshot directory under a merge-sink root, if one
    * has been published. Uses the Hadoop FileSystem API (works on HDFS /
    * object stores, not just the local FS). */
  def currentSnapshotDir(spark: org.apache.spark.sql.SparkSession,
                         targetPath: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(targetPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new org.apache.hadoop.fs.Path(root, ManifestName)
    if (!fs.exists(manifest)) None
    else {
      val in = fs.open(manifest)
      val name =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      if (name.isEmpty) None else Some(new org.apache.hadoop.fs.Path(root, name).toString)
    }
  }

  /** Read the live snapshot a [[foreachBatchMerge]] sink last published. */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
                   targetPath: String): Option[DataFrame] =
    currentSnapshotDir(spark, targetPath).map(spark.read.parquet(_))

  /** foreachBatch merge sink — the streaming version of diff_apply_merge:
    * each micro-batch of snapshot rows is upserted as ONE set-based job
    * (anti-join out replaced keys, union the batch).
    *
    * Crash-safe publication: every batch writes a fresh versioned
    * directory `snap-<batchId>` under the target root and then atomically
    * repoints the `_CURRENT` manifest via a FileContext rename with
    * OVERWRITE — readers ([[readSnapshot]]) always see a complete
    * snapshot; a crash mid-write leaves the manifest on the previous
    * version. Replay of a batch (exactly-once via upstream
    * `checkpointLocation`) is idempotent: if the manifest already points
    * at this batch's snapshot the merge is skipped, otherwise the merge
    * re-runs against the pre-batch snapshot the manifest still names.
    * Superseded snapshot dirs older than the previous one are pruned. */
  def foreachBatchMerge(stream: DataFrame, targetPath: String, key: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      mergeBatch(batch, batchId, targetPath, key)
    }

  /** One micro-batch of the merge sink — public so the replay-idempotency
    * contract is directly testable (PipelineSpec calls it twice with the
    * same batchId and asserts the second call is a no-op). */
  def mergeBatch(batch: DataFrame, batchId: Long, targetPath: String, key: String): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(targetPath)
    val fs = root.getFileSystem(conf)
    val current = currentSnapshotDir(spark, targetPath)
    if (!current.map(new org.apache.hadoop.fs.Path(_).getName).contains(snapDirName(batchId))) {
      val merged = current match {
        case None => batch
        case Some(cur) =>
          val target = spark.read.parquet(cur)
          target.join(batch.select(col(key)).distinct(), Seq(key), "left_anti")
            .unionByName(batch)
      }
      val next = new org.apache.hadoop.fs.Path(root, snapDirName(batchId))
      merged.write.mode("overwrite").parquet(next.toString)
      // publish: manifest tmp file, then atomic rename-with-overwrite
      val tmp = new org.apache.hadoop.fs.Path(root, ManifestName + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(next.getName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, conf)
      fc.rename(tmp, new org.apache.hadoop.fs.Path(root, ManifestName),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      // prune snapshots older than the previous one (kept for in-flight readers)
      val keep = Set(snapDirName(batchId), snapDirName(batchId - 1))
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith("snap-") && !keep(n)) fs.delete(st.getPath, true)
      }
    }
  }
}
