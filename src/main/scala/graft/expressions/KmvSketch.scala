package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** `graft_kmv(hash, k)` — KMV (k-minimum-values) distinct-count sketch
  * as a native `TypedImperativeAggregate`: the bounded-state scale tier
  * of [[graft.llm.Sketches.kmvDistinct]], whose relational form is the
  * executable oracle spec (the two are parity-tested in SketchesSpec).
  *
  * The child is the ALREADY-HASHED value (a 60-bit non-negative long,
  * same SHA-256-derived hash the relational tier uses), so the sketch
  * stays portable: the state is "the k smallest distinct hashes", a
  * pure function of the value set, reproducible by any engine with
  * sha256 — unlike approx_count_distinct's engine-private HLL++.
  *
  * Per-group state is BOUNDED at k longs through the whole
  * partial/merge/final chain — the shuffle carries one ≤(4+8k)-byte
  * summary per (group, map partition), never the distinct-hash set
  * itself. That is the fix for the relational tier's scale hazard: a
  * billion-distinct group costs a billion-row single-task window there,
  * and k longs here.
  *
  * Returns `struct<n_kept long, kth long>`: n_kept = retained distinct
  * hashes (= exact distinct count while < k), kth = the largest
  * retained hash (the k-th minimum once saturated; meaningful to the
  * estimator only when n_kept = k). The estimator itself lives in the
  * Column layer so both tiers share one formula.
  */
case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= 65536, s"k must be in [2, 65536], got $k")

  override def prettyName: String = "graft_kmv"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", LongType, nullable = false),
    StructField("kth", LongType, nullable = true)))

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def insert(buf: mutable.TreeSet[Long], h: Long): Unit =
    if (!buf.contains(h)) {
      if (buf.size < k) buf += h
      else if (h < buf.last) { buf -= buf.last; buf += h }
    }

  override def update(buf: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long],
      other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericInternalRow(Array[Any](
      buf.size.toLong,
      if (buf.isEmpty) null else buf.last))

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinctAgg =
    copy(child = newChild)
}

object KmvDistinctAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[KmvDistinctAgg].getName, "graft_kmv")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_kmv expects (hash, k); got ${exprs.length} args")
    val k = exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue()
    KmvDistinctAgg(exprs.head, k)
  }
}
