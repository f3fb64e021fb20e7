package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_heavy_hitters(item, capacity)` — SpaceSaving heavy-hitters
  * summary as a native `TypedImperativeAggregate` (the custom-AGGREGATE
  * tier of the extension surface, complementing the scalar Expressions
  * and the `graft_cidr_hosts` Generator).
  *
  * Returns `array<struct<item string, cnt long, err long>>` sorted by
  * (cnt desc, item asc). Per-group state is BOUNDED at `capacity`
  * entries regardless of cardinality — the point of the sketch: top
  * tokens / URLs / event types per group over 100 TB without shuffling
  * a full (group, item) count table; the shuffle carries one
  * ≤capacity-entry summary per group per map partition.
  *
  * Guarantees, stated honestly:
  *  - distinct items in the group ≤ capacity ⇒ EXACT counts, err = 0
  *    (this regime is what the q57 oracle checks);
  *  - over capacity ⇒ classic SpaceSaving within a partition (reported
  *    cnt overestimates by ≤ err); cross-partition merge sums matching
  *    entries and trims to capacity, so merged `err` is a per-chain
  *    bound, not a global one — use capacity ≥ ~10× the k you report.
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]]
  with UnaryLike[Expression] {

  require(capacity > 0 && capacity <= 100000,
    s"capacity must be in [1, 100000], got $capacity")

  override def prettyName: String = "graft_heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("cnt", LongType),
    StructField("err", LongType))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def insert(buf: mutable.HashMap[String, (Long, Long)],
      item: String, cnt: Long, err: Long): Unit =
    buf.get(item) match {
      case Some((c, e)) => buf.update(item, (c + cnt, e + err))
      case None if buf.size < capacity => buf.update(item, (cnt, err))
      case None =>
        // evict the minimum-count entry; the newcomer inherits its count
        // as error bound (classic SpaceSaving replacement)
        val (minItem, (minCnt, _)) = buf.minBy { case (k, (c, _)) => (c, k) }
        buf.remove(minItem)
        buf.update(item, (minCnt + cnt, minCnt + err))
    }

  override def update(buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, (Long, Long)],
      other: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    other.foreach { case (item, (c, e)) =>
      buf.get(item) match {
        case Some((c0, e0)) => buf.update(item, (c0 + c, e0 + e))
        case None => buf.update(item, (c, e))
      }
    }
    if (buf.size > capacity) {
      // trim to capacity: keep the largest counts (deterministic
      // tie-break on the item), drop the rest — dropped mass is small
      // by construction (they were the minima of both summaries)
      val keep = buf.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
      buf.clear()
      keep.foreach { case (k, v) => buf.update(k, v) }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val sorted = buf.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
    new GenericArrayData(sorted.map { case (item, (c, e)) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c, e))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, (c, e)) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      val k = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      buf.update(k, (in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}

object HeavyHittersAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HeavyHittersAgg].getName, "graft_heavy_hitters")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_heavy_hitters expects (item, capacity); got ${exprs.length} args")
    val cap = exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue()
    HeavyHittersAgg(exprs.head, cap)
  }
}
