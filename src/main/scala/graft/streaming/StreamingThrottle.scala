package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.{assert_true, coalesce, col, lit, unix_micros, when}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming keyed throttle — the continuous twin of
  * [[Streams.throttleBatch]] ("at most one delivery per key per TTL"),
  * the rate-limiter shape every notification/alerting stream runs.
  *
  * The batch law is a GREEDY WALK over each key's events in (event
  * time, id) order: keep the first, then each event at least `ttl`
  * after the LAST KEPT one. The walk is order-sensitive, so a
  * processing-order streaming throttle diverges the moment chunks
  * arrive out of order. This twin therefore separates ARRIVAL from
  * DECISION — the canonical event-time pattern `transformWithState`
  * exists for:
  *
  *   - arrivals append to a per-key `ListState` buffer of
  *     (ts_us, event_id) — 16 bytes/undecided event, nothing else;
  *   - decisions happen only for events at or below the WATERMARK
  *     (no earlier event can still arrive): the ready slice is sorted
  *     and replayed through the greedy recurrence against a per-key
  *     `ValueState` (started, last_kept_us) — exactly the one-timestamp
  *     state the batch operator's doc names, with started as an
  *     EXPLICIT boolean (a -1 sentinel would break on pre-epoch
  *     negative-µs events — the r9 ADVICE finding on the batch form);
  *   - a key with a non-empty buffer registers an event-time TIMER one
  *     ms past the current watermark, so tails flush as the watermark
  *     advances even if the key never receives another row.
  *
  * Convergence law (gated in StreamingSpec): for any chunking and any
  * arrival order whose lateness the watermark delay covers, the union
  * of emitted rows equals `throttleBatch` on the same events. Kept
  * rows are emitted exactly once (Append mode — a decision below the
  * watermark is final, never retracted). Rows arriving later than the
  * watermark allows are dropped by Spark ahead of the processor — the
  * standard event-time contract, identical to windowed aggregation.
  * Decisions are taken STRICTLY below the watermark: Spark still
  * admits a late row whose event time equals the watermark, so a
  * tie-timestamped straggler must remain orderable against the
  * undecided tail.
  *
  * DOMAIN LIMIT — pre-epoch events (gated in StreamingSpec): the
  * batch form explicitly supports negative epoch-µs; the streaming
  * twin CANNOT — Spark's initial watermark is 0 ms, so every
  * pre-epoch event is below the watermark at the first batch and a
  * late pre-epoch arrival is dropped before the processor sees it,
  * silently breaking convergence. [[kept]] therefore REFUSES
  * pre-epoch event times loudly (assert_true folded into the ts value
  * path, so the guard cannot be pruned): historical corpora belong on
  * `throttleBatch`, which is the replayable form anyway.
  *
  * Scale: state per key = one (bool, long) + only the UNDECIDED tail of
  * the buffer (bounded by events per key per watermark-delay window,
  * not by stream length) on RocksDB; keys shard across executors by
  * the groupByKey exchange. Idle keys EVICT: once a key's buffer is
  * empty and the watermark passes last_kept + ttl, an event-time
  * cleanup timer clears the (started, last_kept) scalar — output-
  * identical by the recurrence (any still-admissible event is ≥ ttl
  * past last_kept, so fresh and remembered state keep the same rows;
  * the eviction-horizon schedule is gated in StreamingSpec). State
  * TTLConfig cannot express this: it is processing-time-only and
  * Spark rejects it under TimeMode.EventTime. */
object StreamingThrottle {

  /** Input row — the four columns the batch form consumes. */
  final case class ThrottleEv(user_id: Long, event_type: String,
                              event_id: Long, ts: java.sql.Timestamp)

  /** A delivery the throttle let through (the batch form's output row). */
  final case class Kept(user_id: Long, event_type: String,
                        event_id: Long, ts_us: Long)

  /** Max-tracking AccumulatorV2 — the state-size ladder's instrument.
    * The store-level metrics cannot see the undecided tail (RocksDB
    * numRowsTotal counts state KEYS per column family; memoryUsedBytes
    * tracks the memtable, i.e. bytes ever written — both measured as
    * artifacts in the first r11 ladder run), so the processor gauges
    * its own buffer length at every drain. */
  class MaxAccumulator extends org.apache.spark.util.AccumulatorV2[Long, Long] {
    private var m = 0L
    override def isZero: Boolean = m == 0L
    override def copy(): MaxAccumulator = { val c = new MaxAccumulator; c.m = m; c }
    override def reset(): Unit = m = 0L
    override def add(v: Long): Unit = m = math.max(m, v)
    override def merge(o: org.apache.spark.util.AccumulatorV2[Long, Long]): Unit =
      m = math.max(m, o.value)
    override def value: Long = m
  }

  class Processor(ttlUs: Long,
                  tailGauge: Option[MaxAccumulator] = None)
      extends StatefulProcessor[(Long, String), ThrottleEv, Kept] {

    @transient private var buf: ListState[(Long, Long)] = _     // (ts_us, event_id) awaiting decision
    @transient private var thr: ValueState[(Boolean, Long)] = _ // (started, last_kept_us)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      // No TTLConfig on either state: Spark REJECTS state TTL in
      // TimeMode.EventTime ([STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_
      // ASSIGN_TTL] — TTLConfig is processing-time-only), and this
      // processor needs event-time timers. Idle-key eviction is instead
      // the event-time CLEANUP TIMER in [[reconcileTimers]]/
      // [[handleExpiredTimer]], which is output-identical by the
      // throttle recurrence (see the eviction note there).
      buf = getHandle.getListState[(Long, Long)]("buf",
        Encoders.product[(Long, Long)], TTLConfig.NONE)
      thr = getHandle.getValueState[(Boolean, Long)]("thr",
        Encoders.product[(Boolean, Long)], TTLConfig.NONE)
    }

    // full-precision µs, the batch operator's unix_micros (getTime holds
    // millis; getNanos holds the sub-second part including the millis)
    private def usOf(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    /** Decide everything at or below the watermark; return (kept rows,
      * whether undecided events remain buffered). */
    private def drain(key: (Long, String), wmUs: Long): (Iterator[Kept], Boolean) = {
      val all = buf.get().toArray
      tailGauge.foreach(_.add(all.length.toLong)) // per-key undecided tail
      if (all.isEmpty) return (Iterator.empty, false)
      // STRICTLY below: Spark admits late rows whose event time EQUALS
      // the watermark, so a tie-timestamped straggler must still be
      // orderable — deciding at equality would replay it after events
      // it should precede in (ts_us, event_id) order (r11 ADVICE fix).
      val (ready, pending) = all.partition(_._1 < wmUs)
      if (ready.isEmpty) return (Iterator.empty, true)
      buf.clear()
      if (pending.nonEmpty) buf.appendList(pending)
      var (started, last) = if (thr.exists()) thr.get() else (false, 0L)
      val kept = Array.newBuilder[Kept]
      ready.sortInPlace() // tuple ordering == the batch (ts_us, event_id) sort
      ready.foreach { e =>
        if (!started || e._1 - last >= ttlUs) {
          started = true; last = e._1
          kept += Kept(key._1, key._2, e._2, e._1)
        }
      }
      thr.update((started, last))
      (kept.result().iterator, pending.nonEmpty)
    }

    /** IDLE-KEY EVICTION (r11) — event-time, output-identical. A key
      * whose buffer is empty holds only the (started, last_kept_us)
      * scalar; once the watermark passes last_kept + ttl, forgetting it
      * changes NOTHING: any still-admissible event e has
      * ts_us ≥ watermark > last_kept + ttl, so the remembered state
      * would keep e (e − last ≥ ttl) and a fresh state keeps e too —
      * and both then carry last = e identically. So after each drain:
      * pending tail → flush timer one ms past the watermark (as
      * before); no tail but live scalar → a cleanup timer at
      * last_kept + ttl (+1 ms); when a timer fires past that horizon
      * with an empty buffer, the scalar is cleared and the key's state
      * footprint drops to zero. A timer that fires EARLY (the key kept
      * a newer event since) just re-arms. TTLConfig cannot express
      * this — it is processing-time-only and Spark rejects it in
      * TimeMode.EventTime.
      *
      * Timer hygiene (r12): the desired timer set per key is exactly
      * ONE timestamp (the flush tick, or the eviction horizon, or
      * nothing once evicted), so each decision point RECONCILES the
      * registered set against that target — every stale timer (an old
      * flush tick superseded by a later drain, a horizon left behind by
      * a newer kept event) is deleted rather than left to fire early
      * and re-arm (the r11 ADVICE churn finding). `exclude` carries the
      * timestamp of a timer currently mid-fire: Spark removes it itself
      * after handleExpiredTimer returns, so deleting it here would
      * double-remove. The desired timestamp can never EQUAL the
      * excluded one (which would skip the re-register and then lose the
      * timer to Spark's own removal): a timer fires only once the
      * watermark reaches it (T ≤ wm), the flush tick is wm+1 > T, and a
      * surviving horizon satisfies last+ttl ≥ wm ≥ T so the horizon
      * tick last+ttl+1 > T — both candidates sit strictly above any
      * mid-fire timestamp. */
    private def reconcileTimers(pending: Boolean, timerValues: TimerValues,
                                exclude: Long = Long.MinValue): Unit = {
      val want: Option[Long] =
        if (pending) Some(timerValues.getCurrentWatermarkInMs() + 1)
        else if (thr.exists()) {
          val (_, last) = thr.get()
          Some(Math.floorDiv(last, 1000L) + ttlUs / 1000L + 1L)
        } else None
      // materialize before deleting: the state-store API does not
      // promise listTimers' iterator tolerates concurrent deleteTimer
      // (RocksDB/HDFS providers happen to today — r12 ADVICE)
      val timers: List[Long] = getHandle.listTimers().toList
      var present = false
      timers.foreach { ts =>
        if (want.contains(ts)) present = true
        else if (ts != exclude) getHandle.deleteTimer(ts)
      }
      want.foreach(ts => if (!present) getHandle.registerTimer(ts))
    }

    private def maybeEvict(wmUs: Long): Unit =
      if (thr.exists() && buf.get().isEmpty) {
        // started is invariantly TRUE here: drain writes thr only after
        // replaying at least one ready event, and the greedy walk always
        // keeps the first of those when started is false (r11 ADVICE —
        // the old `!started ||` arm was unreachable, and would have
        // evicted WITHOUT a horizon check had it ever become reachable)
        val (_, last) = thr.get()
        if (wmUs - last > ttlUs) thr.clear()
      }

    override def handleInputRows(key: (Long, String), rows: Iterator[ThrottleEv],
                                 timerValues: TimerValues): Iterator[Kept] = {
      rows.foreach(e => buf.appendValue((usOf(e.ts), e.event_id)))
      val (out, pending) = drain(key, timerValues.getCurrentWatermarkInMs() * 1000L)
      reconcileTimers(pending, timerValues)
      out
    }

    override def handleExpiredTimer(key: (Long, String), timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[Kept] = {
      val (out, pending) = drain(key, timerValues.getCurrentWatermarkInMs() * 1000L)
      maybeEvict(timerValues.getCurrentWatermarkInMs() * 1000L)
      reconcileTimers(pending, timerValues,
        exclude = expiredTimerInfo.getExpiryTimeInMs())
      out
    }
  }

  /** Wire the processor over an event stream (must carry `ts` for the
    * watermark; `delay` bounds tolerated disorder). Idle-key state
    * eviction is built in — the event-time cleanup timer in the
    * processor, gated output-identical in StreamingSpec — so there is
    * no retention knob to size. */
  def kept(events: DataFrame, ttlHours: Int = 72,
           delay: String = "10 minutes",
           tailGauge: Option[MaxAccumulator] = None): Dataset[Kept] = {
    import events.sparkSession.implicits._
    val ttlUs = ttlHours * 3600L * 1000000L
    // pre-epoch refusal, folded into the ts value path (assert_true on a
    // dropped column would be pruned away; inside the kept value it runs)
    val guardedTs = when(
      assert_true(coalesce(unix_micros(col("ts")), lit(0L)) >= 0,
        lit("StreamingThrottle: pre-epoch (negative epoch-us) event time — " +
          "the initial watermark is 0 ms so streaming convergence cannot hold; " +
          "use Streams.throttleBatch for historical corpora")).isNull,
      col("ts")).as("ts")
    events
      .select(col("user_id"), col("event_type"), col("event_id"), guardedTs)
      .withWatermark("ts", delay)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
      .as[ThrottleEv]
      .groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new Processor(ttlUs, tailGauge),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
