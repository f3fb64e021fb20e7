package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_cms(hashes, w)` — Count-Min frequency sketch as a native
  * `TypedImperativeAggregate`: a d×w counter matrix answering "how
  * often does value x occur" with one-sided error (never an
  * undercount, overcount ≤ N/w per row whp) from FIXED state — d·w
  * longs regardless of the key cardinality. The 100 TB companion to
  * [[HeavyHittersAgg]]: SpaceSaving surfaces the top keys, CMS answers
  * point queries about ANY key, including ones chosen after the scan.
  *
  * The child is an array of d ALREADY-SALTED 60-bit SHA-derived hashes
  * (`Sketches.cmsHashes` — hash_i = sha256("cms<i>:" ++ value)), so
  * every counter is engine-reproducible: the DuckDB oracle rebuilds
  * the same d row-bucket counts by grouping, no sketch privacy. Rows
  * whose hash array is NULL or contains a NULL (a NULL value salts to
  * NULL everywhere) are skipped — NULLs are not counted elements,
  * matching the KMV/HLL convention.
  *
  * Returns the matrix as `array<array<long>>` (d rows of w counters);
  * the point-estimate min-over-rows lives in the Column layer
  * ([[graft.llm.Sketches.cmsFrequencies]]) so the probe side and the
  * oracle share one formula.
  */
case class CmsSketchAgg(
    child: Expression,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(w >= 2 && w <= 65536, s"w must be in [2, 65536], got $w")

  override def prettyName: String = "graft_cms"
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  // d is a property of the incoming hash array; fixed at first update,
  // serialized with the state so merges of empty/non-empty agree.
  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    var i = 0
    while (i < d) { if (arr.isNullAt(i)) return buf; i += 1 }
    val b = if (buf.length == 0) new Array[Long](d * w) else buf
    require(b.length == d * w,
      s"graft_cms: inconsistent hash-array length $d (matrix ${b.length / w})")
    i = 0
    while (i < d) {
      val idx = (arr.getLong(i) % w).toInt
      b(i * w + idx) += 1L
      i += 1
    }
    b
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) return buf
    if (buf.length == 0) return other.clone()
    require(buf.length == other.length,
      s"graft_cms: merging matrices of different d (${buf.length} vs ${other.length})")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val d = if (buf.length == 0) 0 else buf.length / w
    val rows = new Array[Any](d)
    var i = 0
    while (i < d) {
      rows(i) = new GenericArrayData(
        java.util.Arrays.copyOfRange(buf, i * w, (i + 1) * w))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

object CmsSketchAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CmsSketchAgg].getName, "graft_cms")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_cms expects (hashes, w); got ${exprs.length} args")
    val w = exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue()
    CmsSketchAgg(exprs.head, w)
  }
}
