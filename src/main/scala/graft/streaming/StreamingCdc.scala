package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.OutputMode

/** Streaming CDC latest-state maintenance — the true-streaming twin of
  * the batch compaction (graft.sync.Cdc): a changelog stream of
  * (key, seq, op, price_cents, status) rows arriving OUT OF ORDER is
  * folded into per-key `ValueState` holding the highest-sequence change
  * seen so far; a row only overwrites when its seq is strictly greater,
  * which is the streaming statement of the batch `max_by` law — so the
  * stream's final state equals the batch compaction of the same
  * changelog regardless of chunking or arrival order (gated in
  * StreamingSpec). Emits the refreshed state row whenever a key's state
  * CHANGES (update-mode semantics); stale arrivals emit nothing. Delete
  * tombstones stay in state (the batch side's `compactAll` view) — a
  * downstream materializer filters them, exactly like the batch `apply`.
  * State is one small tuple per live key on RocksDB — the 100 TB story
  * is state ∝ keyspace, not stream length; production adds a TTL for
  * keys whose entity is known-retired. Price rides as integer cents so
  * retries and merge order can't perturb it. */
object StreamingCdc {

  /** (key, seq, op, price_cents, status) changelog row. */
  type CdcRow = (Long, Long, String, Long, String)

  /** Emitted whenever a key's latest-state changes. */
  final case class CdcState(key: Long, last_seq: Long, op: String,
                            price_cents: Long, status: String)

  class LatestStateProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, CdcRow, CdcState] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var latest: ValueState[(Long, String, Long, String)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[(Long, String, Long, String)](
        "latest", E.tuple(E.scalaLong, E.STRING, E.scalaLong, E.STRING), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[CdcRow],
                                 timerValues: TimerValues): Iterator[CdcState] = {
      var cur = if (latest.exists()) latest.get() else null
      var changed = false
      rows.foreach { case (_, seq, op, cents, status) =>
        if (cur == null || seq > cur._1) { cur = (seq, op, cents, status); changed = true }
      }
      if (changed) {
        latest.update(cur)
        Iterator.single(CdcState(key, cur._1, cur._2, cur._3, cur._4))
      } else Iterator.empty
    }
  }

  /** Wire [[LatestStateProcessor]] over a changelog stream. */
  def latestState(changelog: Dataset[CdcRow]): Dataset[CdcState] = {
    import changelog.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    changelog.groupByKey(_._1)
      .transformWithState(new LatestStateProcessor, TimeMode.None(), OutputMode.Update())
  }
}
