package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_ksample(hash, payload, k)` — deterministic k-per-group
  * sample as a bounded-state `TypedImperativeAggregate`: keeps the
  * payloads carried by the k SMALLEST distinct hashes. With a
  * salted-SHA hash of the payload (the splitAssign/KMV trick) this is
  * a uniform, rerun/engine-stable group sample: same rows chosen on
  * any cluster, any partitioning, any engine — rand() reservoirs are
  * none of those.
  *
  * The scale point (same as [[KmvDistinctAgg]]): the relational
  * formulation — `row_number().over(partitionBy(group).orderBy(h))
  * ≤ k` — lands a group's ENTIRE row set in one task, which is
  * exactly what a stratified sampler must not do to its hottest
  * stratum. Here per-group state is ≤ k (hash, payload) entries
  * through partial/merge/final; the relational form is the executable
  * oracle spec (q90) and the tiers are parity-tested.
  *
  * Hash collisions between distinct payloads keep the MINIMUM payload
  * (an order-independent tie-break — first-seen would depend on scan
  * order). Output: `array<struct<h long, v string>>` ordered by hash.
  */
case class KSampleAgg(
    hashChild: Expression,
    payloadChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeMap[Long, String]]
  with BinaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"k must be in [1, 65536], got $k")

  override def left: Expression = hashChild
  override def right: Expression = payloadChild
  override def prettyName: String = "graft_ksample"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("v", StringType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.TreeMap[Long, String] =
    mutable.TreeMap.empty

  private def insert(buf: mutable.TreeMap[Long, String], h: Long, v: String): Unit =
    buf.get(h) match {
      case Some(existing) => if (v < existing) buf.update(h, v)
      case None =>
        if (buf.size < k) buf.update(h, v)
        else if (h < buf.lastKey) { buf.remove(buf.lastKey); buf.update(h, v) }
    }

  override def update(buf: mutable.TreeMap[Long, String],
      input: InternalRow): mutable.TreeMap[Long, String] = {
    val h = hashChild.eval(input)
    val v = payloadChild.eval(input)
    if (h != null && v != null)
      insert(buf, h.asInstanceOf[Long], v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: mutable.TreeMap[Long, String],
      other: mutable.TreeMap[Long, String]): mutable.TreeMap[Long, String] = {
    other.foreach { case (h, v) => insert(buf, h, v) }
    buf
  }

  override def eval(buf: mutable.TreeMap[Long, String]): Any =
    new GenericArrayData(buf.toSeq.map { case (h, v) =>
      new GenericInternalRow(Array[Any](h, UTF8String.fromString(v)))
    }.toArray[Any])

  override def serialize(buf: mutable.TreeMap[Long, String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) =>
      out.writeLong(h)
      val vb = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(vb.length); out.write(vb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeMap[Long, String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeMap.empty[Long, String]
    var i = 0
    while (i < n) {
      val h = in.readLong()
      val vb = new Array[Byte](in.readInt()); in.readFully(vb)
      buf.update(h, new String(vb, java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KSampleAgg =
    copy(hashChild = newLeft, payloadChild = newRight)
}

object KSampleAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[KSampleAgg].getName, "graft_ksample")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"graft_ksample expects (hash, payload, k); got ${exprs.length} args")
    require(exprs(2).foldable,
      "graft_ksample: k must be a literal (foldable) expression — " +
        s"got ${exprs(2).sql}")
    val k = exprs(2).eval(InternalRow.empty).asInstanceOf[Number].intValue()
    KSampleAgg(exprs.head, exprs(1), k)
  }
}
