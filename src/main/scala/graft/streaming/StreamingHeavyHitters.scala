package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.functions.Sketches

/** Streaming heavy-hitter tracking: a SpaceSaving sketch per key group,
  * held in `transformWithState` typed state on the RocksDB store and
  * updated per micro-batch — "what are the top items per group right
  * now" over an unbounded stream with O(groups × capacity) total state.
  * The continuous form of the batch `agg_topk_sketch`: same core
  * (graft.functions.Sketches), same retention guarantee (an item with
  * true count > N/capacity is always in the sketch), and counts exact
  * while a group's distinct cardinality stays under `capacity`.
  *
  * Each batch emits the group's current top-`k` as
  * (group, rank, item, est_n) — Update mode, latest row per (group,
  * rank) wins downstream. State is the serialized sketch (the same
  * byte format the aggregate shuffles), bounded by construction; add a
  * TTL for keys that can go quiet forever.
  */
object StreamingHeavyHitters {

  final case class TopItem(group: Long, rank: Int, item: String, est_n: Long)

  class Processor(k: Int, capacity: Int)
      extends StatefulProcessor[Long, (Long, String), TopItem] {

    @transient private var sketch: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sketch = getHandle.getValueState[Array[Byte]]("sketch", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(group: Long, rows: Iterator[(Long, String)],
                                 timerValues: TimerValues): Iterator[TopItem] = {
      val buf =
        if (sketch.exists()) Sketches.ssDeserialize(sketch.get())
        else scala.collection.mutable.HashMap.empty[String, Long]
      rows.foreach { case (_, item) => Sketches.ssUpdate(buf, item, capacity) }
      sketch.update(Sketches.ssSerialize(buf))
      Sketches.ssTop(buf, k).zipWithIndex.iterator.map { case ((item, n), i) =>
        TopItem(group, i + 1, item, n)
      }
    }
  }

  /** Wire the processor over a (group, item) stream. */
  def topItems(stream: Dataset[(Long, String)], k: Int = 3, capacity: Int = 32)
      : Dataset[TopItem] = {
    import stream.sparkSession.implicits._
    stream.groupByKey(_._1)
      .transformWithState(new Processor(k, capacity), TimeMode.None(), OutputMode.Update())
  }
}
