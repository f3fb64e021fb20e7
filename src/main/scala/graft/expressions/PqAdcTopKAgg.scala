package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The FAISS-style compressed-domain scan as ONE bounded-state
  * aggregate: every corpus row's PQ codes are ADC-scored against ALL
  * queries' lookup tables inside the aggregate, and the state is one
  * k-bounded (adc, id) heap PER QUERY — nq·k pairs through the whole
  * partial/merge/final chain, however large the corpus.
  *
  * This replaces the corpus×queries crossJoin + rank window: that
  * shape materializes |corpus|·|queries| rows just to throw all but
  * k·|queries| away (measured: the row machinery dominated the scan
  * 10:1 once the per-row arithmetic went native). Here the corpus is
  * traversed ONCE, map-side, and the shuffle carries nq·k pairs per
  * partition.
  *
  * Determinism: a candidate replaces the current worst iff
  * (adc, id) < worst lexicographically — exactly the rank window's
  * ORDER BY adc_micro, neighbor_id. LUT entries are integer micro
  * units, so sums are order-free and engine-exact.
  *
  * Output: array<struct<q_idx int, rank int, neighbor_id long,
  * adc_micro long>> — q_idx indexes the constructor-order LUTs;
  * callers join it back to their query ids (a ≤nq-row broadcast).
  */
case class PqAdcTopKAgg(
    left: Expression,  // neighbor id (long)
    right: Expression, // PQ codes (array<int>)
    luts: Array[Array[Long]],
    k: Int,
    ncent: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[mutable.TreeSet[(Long, Long)]]]
  with BinaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"k must be in [1, 65536], got $k")
  require(luts.nonEmpty && luts.length <= 65536,
    s"need 1..65536 query LUTs, got ${luts.length}")

  override def prettyName: String = "graft_pq_adc_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q_idx", IntegerType, nullable = false),
    StructField("rank", IntegerType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false),
    StructField("adc_micro", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): Array[mutable.TreeSet[(Long, Long)]] =
    Array.fill(luts.length)(mutable.TreeSet.empty[(Long, Long)])

  private def insert(heap: mutable.TreeSet[(Long, Long)],
      adc: Long, id: Long): Unit = {
    if (heap.size < k) heap += ((adc, id))
    else {
      val worst = heap.last
      if (adc < worst._1 || (adc == worst._1 && id < worst._2)) {
        heap -= worst
        heap += ((adc, id))
      }
    }
  }

  override def update(buf: Array[mutable.TreeSet[(Long, Long)]],
      input: InternalRow): Array[mutable.TreeSet[(Long, Long)]] = {
    val idv = left.eval(input)
    val cv = right.eval(input)
    if (idv != null && cv != null) {
      val id = idv.asInstanceOf[Long]
      val codes = cv.asInstanceOf[ArrayData]
      val n = codes.numElements()
      var qi = 0
      while (qi < luts.length) {
        val lut = luts(qi)
        var acc = 0L
        var s = 0
        while (s < n) {
          acc += lut(s * ncent + codes.getInt(s))
          s += 1
        }
        insert(buf(qi), acc, id)
        qi += 1
      }
    }
    buf
  }

  override def merge(buf: Array[mutable.TreeSet[(Long, Long)]],
      other: Array[mutable.TreeSet[(Long, Long)]]): Array[mutable.TreeSet[(Long, Long)]] = {
    var qi = 0
    while (qi < luts.length) {
      other(qi).foreach { case (adc, id) => insert(buf(qi), adc, id) }
      qi += 1
    }
    buf
  }

  override def eval(buf: Array[mutable.TreeSet[(Long, Long)]]): Any = {
    val rows = mutable.ArrayBuffer.empty[InternalRow]
    var qi = 0
    while (qi < luts.length) {
      var r = 1
      buf(qi).foreach { case (adc, id) =>
        rows += new GenericInternalRow(Array[Any](qi, r, id, adc))
        r += 1
      }
      qi += 1
    }
    new GenericArrayData(rows.toArray)
  }

  override def serialize(buf: Array[mutable.TreeSet[(Long, Long)]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { heap =>
      out.writeInt(heap.size)
      heap.foreach { case (adc, id) =>
        out.writeLong(adc); out.writeLong(id)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[mutable.TreeSet[(Long, Long)]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val nq = in.readInt()
    Array.fill(nq) {
      val n = in.readInt()
      val heap = mutable.TreeSet.empty[(Long, Long)]
      var i = 0
      while (i < n) { heap += ((in.readLong(), in.readLong())); i += 1 }
      heap
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PqAdcTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PqAdcTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcTopKAgg =
    copy(left = newLeft, right = newRight)
}

/** The per-GROUP arm of the same k-bounded heap: top-k (value, id)
  * pairs per grouping key via `groupBy(...).agg`, for stages where
  * candidates arrive already scored per group — the IVF-ADC cell
  * join emits (query_id, neighbor_id, adc_micro) rows, and a rank
  * window over them would shuffle-sort EVERY candidate of a group
  * into one task just to keep k. Here the state is one k-bounded
  * (value, id) TreeSet per group and partials merge associatively,
  * so map-side combine bounds the shuffle at k pairs per
  * (partition, group) and nothing ever sorts more than k rows.
  *
  * Determinism: identical contract to [[PqAdcTopKAgg]] — a candidate
  * replaces the current worst iff (value, id) < worst
  * lexicographically, exactly `ORDER BY value ASC, id ASC` +
  * `row_number() <= k`. NULL value or id rows are skipped (a
  * candidate without a score must never outrank one with a score —
  * the same rule the flat ADC scan pinned).
  *
  * Output: array<struct<rank int, id long, value long>> — explode
  * and rename at the call site. */
case class GroupTopKAgg(
    left: Expression,  // value (long), ascending
    right: Expression, // id (long), ascending tiebreak
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[(Long, Long)]]
  with BinaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"k must be in [1, 65536], got $k")

  override def prettyName: String = "graft_group_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("value", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[(Long, Long)] =
    mutable.TreeSet.empty[(Long, Long)]

  private def insert(heap: mutable.TreeSet[(Long, Long)],
      value: Long, id: Long): Unit = {
    if (heap.size < k) heap += ((value, id))
    else {
      val worst = heap.last
      if (value < worst._1 || (value == worst._1 && id < worst._2)) {
        heap -= worst
        heap += ((value, id))
      }
    }
  }

  override def update(buf: mutable.TreeSet[(Long, Long)],
      input: InternalRow): mutable.TreeSet[(Long, Long)] = {
    val v = left.eval(input)
    val idv = right.eval(input)
    if (v != null && idv != null) {
      insert(buf, v.asInstanceOf[Long], idv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: mutable.TreeSet[(Long, Long)],
      other: mutable.TreeSet[(Long, Long)]): mutable.TreeSet[(Long, Long)] = {
    other.foreach { case (value, id) => insert(buf, value, id) }
    buf
  }

  override def eval(buf: mutable.TreeSet[(Long, Long)]): Any = {
    val rows = new Array[Any](buf.size)
    var r = 0
    buf.foreach { case (value, id) =>
      rows(r) = new GenericInternalRow(Array[Any](r + 1, id, value))
      r += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: mutable.TreeSet[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (value, id) =>
      out.writeLong(value); out.writeLong(id)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = mutable.TreeSet.empty[(Long, Long)]
    var i = 0
    while (i < n) { heap += ((in.readLong(), in.readLong())); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GroupTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GroupTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GroupTopKAgg =
    copy(left = newLeft, right = newRight)
}
