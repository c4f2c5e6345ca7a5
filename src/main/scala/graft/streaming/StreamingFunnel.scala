package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming conversion funnel: the continuous twin of
  * `graft.ops.Behavior.funnelSteps`. Per-user funnel progress lives in
  * `transformWithState` typed state (24 bytes per user — the three step
  * timestamps) and advances per micro-batch; each batch emits the
  * user's current stage in Update mode, so the latest row per user IS
  * the live funnel position and the 3-row reach summary is a trivial
  * aggregate over it.
  *
  * Semantics match the batch operator — step k counts only strictly
  * after the user's recorded step-(k-1) time — EXACTLY when each user's
  * events arrive in event-time order across batches (the
  * chunk-equivalence harness feeds ordered chunks; production puts a
  * watermark-delayed sorted replay in front, the same contract as any
  * order-sensitive streaming state machine). Within a batch, rows are
  * sorted by event time before folding, so intra-batch disorder never
  * corrupts the state. State is monotone (timestamps only ever get
  * SET, never moved), so a user's emitted stage never regresses and
  * crash-replay of a batch reaches the same state (the fold is
  * idempotent on already-set steps).
  */
object StreamingFunnel {

  /** (user, event type, event time µs) — the minimal funnel input. */
  final case class FunnelEv(user_id: Long, event_type: String, ts_us: Long)

  /** Per-batch emission: the user's funnel stage (0-3) after the batch. */
  final case class FunnelUpdate(user_id: Long, stage: Int)

  class Processor(steps: Seq[String])
      extends StatefulProcessor[Long, FunnelEv, FunnelUpdate] {
    require(steps.size == 3, "funnel is specialized to 3 steps")

    // (t1, t2, t3) in µs; Unset = step not reached. A sign-test sentinel
    // (-1) would conflate "unset" with any pre-epoch event time and
    // silently zero that user's funnel; Long.MinValue is not a
    // representable µs timestamp for any real event.
    private val Unset = Long.MinValue
    @transient private var st: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("funnel",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[FunnelEv],
                                 timerValues: TimerValues): Iterator[FunnelUpdate] = {
      var (t1, t2, t3) = if (st.exists()) st.get() else (Unset, Unset, Unset)
      rows.toArray.sortBy(_.ts_us).foreach { e =>
        // one event has one type, so at most one branch fires per row;
        // separate ifs let an event advance the earliest step it matches
        if (t1 == Unset && e.event_type == steps(0)) t1 = e.ts_us
        if (t2 == Unset && t1 != Unset && e.event_type == steps(1) && e.ts_us > t1) t2 = e.ts_us
        if (t3 == Unset && t2 != Unset && e.event_type == steps(2) && e.ts_us > t2) t3 = e.ts_us
      }
      st.update((t1, t2, t3))
      val stage =
        if (t3 != Unset) 3 else if (t2 != Unset) 2 else if (t1 != Unset) 1 else 0
      Iterator.single(FunnelUpdate(user, stage))
    }
  }

  /** Wire the processor over a funnel-event stream. */
  def stages(stream: Dataset[FunnelEv],
             steps: Seq[String] = Seq("view", "click", "purchase")): Dataset[FunnelUpdate] = {
    import stream.sparkSession.implicits._
    stream.groupByKey(_.user_id)
      .transformWithState(new Processor(steps), TimeMode.None(), OutputMode.Update())
  }
}
