package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming last-touch attribution: the continuous twin of
  * `graft.ops.Behavior.lastTouchAttribution`. Per-user state is the
  * most recent touch — 16 bytes (ts µs + a channel tag), regardless of
  * history length, which is the whole point: the batch operator
  * windows over each user's full event history, the stream carries
  * ONE (ts, channel) pair per user forward. Each purchase emits its
  * attribution row immediately (Append mode — an attribution, once
  * emitted, never changes, unlike the funnel's Update-mode stage).
  *
  * Semantics match the batch operator exactly when each user's events
  * arrive in event-time order across batches (the chunk-equivalence
  * harness contract shared with StreamingFunnel); within a batch,
  * rows sort by (ts, event_id) before the fold — the batch window's
  * total order — so intra-batch disorder never corrupts state. The
  * lookback compare and lag are exact integer microseconds.
  */
object StreamingAttribution {

  /** The minimal attribution input. */
  final case class AttrEv(user_id: Long, event_type: String,
                          ts_us: Long, event_id: Long, value: Double)

  /** One emitted row per purchase. `lag_us` = −1 flags 'direct'
    * (a real lag is always ≥ 0: the touch precedes the purchase). */
  final case class Attribution(user_id: Long, channel: String,
                               value: Double, lag_us: Long)

  class Processor(lookbackUs: Long)
      extends StatefulProcessor[Long, AttrEv, Attribution] {

    // Long.MinValue = no touch yet (not a representable µs event time;
    // a -1 sentinel would collide with pre-epoch timestamps — the
    // StreamingFunnel lesson)
    private val Unset = Long.MinValue
    @transient private var st: ValueState[(Long, String)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, String)]("lasttouch",
        Encoders.product[(Long, String)], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[AttrEv],
                                 timerValues: TimerValues): Iterator[Attribution] = {
      var (lt, ltType) = if (st.exists()) st.get() else (Unset, "")
      val out = scala.collection.mutable.ArrayBuffer.empty[Attribution]
      rows.toArray.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        e.event_type match {
          case "view" | "click" =>
            lt = e.ts_us; ltType = e.event_type
          case "purchase" =>
            if (lt != Unset && lt >= e.ts_us - lookbackUs)
              out += Attribution(user, ltType, e.value, e.ts_us - lt)
            else
              out += Attribution(user, "direct", e.value, -1L)
          case _ => () // signup/error: neither touch nor conversion
        }
      }
      st.update((lt, ltType))
      out.iterator
    }
  }

  /** Wire the processor over an attribution-event stream. */
  def attributions(stream: Dataset[AttrEv],
                   lookbackUs: Long = 7L * 24 * 3600 * 1000000L): Dataset[Attribution] = {
    import stream.sparkSession.implicits._
    stream.groupByKey(_.user_id)
      .transformWithState(new Processor(lookbackUs), TimeMode.None(), OutputMode.Append())
  }
}
