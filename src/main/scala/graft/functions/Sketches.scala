package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.SqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitter sketch as a `TypedImperativeAggregate` — the
  * "novel sketch" custom-aggregate point: a bounded `capacity`-entry
  * buffer per group regardless of input size, with true partial
  * aggregation (map-side sketches, serialized buffers shuffled, merged
  * reduce-side). At 100 TB this answers "top items per group" in one
  * pass with O(groups × capacity) state, where an exact count would
  * shuffle every distinct item.
  *
  * Guarantees (Metwally et al., "Efficient computation of frequent and
  * top-k elements in data streams", 2005): any item with true count
  * > N/capacity is retained; counts are exact when the group's distinct
  * cardinality never exceeds `capacity` (no eviction ever fires) — the
  * mode the oracle-checked query runs in. Eviction picks the
  * deterministic (count, item) minimum so approximate mode is stable for
  * a fixed input order per partition; cross-partition merge keeps the
  * top `capacity` by (count desc, item asc).
  */
case class SpaceSavingTopK(
    child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] with Serializable {

  require(k <= capacity, "k must be <= capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("est_n", LongType))),
    containsNull = false)
  override def prettyName: String = "topk_sketch"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) Sketches.ssUpdate(buf, v.asInstanceOf[UTF8String].toString, capacity)
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long], b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    Sketches.ssMerge(b1, b2, capacity)

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(Sketches.ssTop(buf, k).map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }.toArray[Any])

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] =
    Sketches.ssSerialize(buf)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] =
    Sketches.ssDeserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
}

object Sketches {
  /** Aggregate column: top-`k` items by frequency from a `capacity`-entry
    * SpaceSaving sketch over a string column. */
  def topkSketch(c: Column, k: Int, capacity: Int): Column =
    SqlShim.column(SpaceSavingTopK(SqlShim.expression(c), k, capacity).toAggregateExpression())

  // ---- Bloom filter bridge (Spark's own sketch, internal expressions) --
  //
  // Spark ships a distributed Bloom build (`BloomFilterAggregate`, the
  // aggregate behind its runtime row-level filters: partial sketches
  // map-side, OR-merged reduce-side) and a codegen'd membership probe
  // (`BloomFilterMightContain`), but registers neither publicly. Both
  // expect the LONG xxhash64 of the value — the same hashing the
  // planner's InjectRuntimeFilter wraps around its keys — so the helpers
  // apply `xxhash64` themselves and callers pass the raw column.

  /** Aggregate column: serialized Bloom filter (binary) over the xxhash64
    * of `c`, sized for `expectedItems` distinct values in `numBits` bits. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    SqlShim.column(
      org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        SqlShim.expression(org.apache.spark.sql.functions.xxhash64(c)),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits), 0, 0)
        .toAggregateExpression())

  /** Membership probe of `c` against a MATERIALIZED Bloom filter. The
    * filter enters the plan as a binary literal — the persisted-artifact
    * form — because `BloomFilterMightContain` requires its filter side
    * foldable (or a scalar subquery, which is exactly how Spark's own
    * runtime filters materialize the same bytes to the driver). */
  def bloomMightContain(bloomBytes: Array[Byte], c: Column): Column =
    SqlShim.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bloomBytes, org.apache.spark.sql.types.BinaryType),
        SqlShim.expression(org.apache.spark.sql.functions.xxhash64(c))))

  // ---- SpaceSaving core, shared by the aggregate and the streaming
  //      heavy-hitter processor (graft.streaming.StreamingHeavyHitters)

  /** One observation: increment if present, insert if room, else evict
    * the deterministic (count, item) minimum inheriting its count. */
  def ssUpdate(buf: mutable.HashMap[String, Long], s: String, capacity: Int): Unit =
    buf.get(s) match {
      case Some(c) => buf.update(s, c + 1L)
      case None if buf.size < capacity => buf.update(s, 1L)
      case None =>
        val (mk, mc) = buf.minBy { case (kk, cc) => (cc, kk) }
        buf.remove(mk)
        buf.update(s, mc + 1L)
    }

  /** Merge two sketches, keeping the top `capacity` by (count, item). */
  def ssMerge(b1: mutable.HashMap[String, Long], b2: mutable.HashMap[String, Long],
              capacity: Int): mutable.HashMap[String, Long] = {
    b2.foreach { case (s, c) => b1.update(s, b1.getOrElse(s, 0L) + c) }
    if (b1.size > capacity) {
      val keep = b1.toSeq.sortBy { case (s, c) => (-c, s) }.take(capacity)
      b1.clear()
      keep.foreach { case (s, c) => b1.update(s, c) }
    }
    b1
  }

  /** Top-k entries, (count desc, item asc) — deterministic. */
  def ssTop(buf: mutable.HashMap[String, Long], k: Int): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (s, c) => (-c, s) }.take(k)

  def ssSerialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) => out.writeUTF(s); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  def ssDeserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }
}
