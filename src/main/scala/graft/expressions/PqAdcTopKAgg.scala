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

/** The IVFADC scan as ONE bounded-state aggregate: [[PqAdcTopKAgg]]
  * with the coarse pruning moved INSIDE — each corpus row's codes are
  * ADC-scored against ONLY the queries probing the row's cell
  * (`cellQueries(cell)`), so both FAISS prunings happen in a single
  * corpus pass with nq·k pairs of state and NO row expansion.
  *
  * This replaces the cell-key broadcast join: that shape multiplied
  * every corpus row by the ~nq·nprobe/nlist probes matching its cell
  * and carried a codes array + a LUT array on every expanded row —
  * measured at 1M×64d, 100 queries, nprobe/nlist = 8/64, the joined
  * form ran 13.0 s while the UNPRUNED flat aggregate ran 1.07 s: the
  * row machinery of the expansion cost 12× more than the 8× lookup
  * reduction saved (the same 10:1 lesson the flat scan's rewrite
  * measured in r10). With the pruning in-aggregate the lookup savings
  * are kept and the expansion is gone.
  *
  * Determinism: identical contract to [[PqAdcTopKAgg]] — insert iff
  * (adc, id) < worst. Rows with NULL id/codes/cell, or a cell outside
  * [0, cellQueries.length), are skipped. Output: the same
  * array<struct<q_idx, rank, neighbor_id, adc_micro>>. */
case class PqAdcCellTopKAgg(
    first: Expression,  // neighbor id (long)
    second: Expression, // PQ codes (array<int>)
    third: Expression,  // coarse cell (int)
    luts: Array[Array[Long]],
    cellQueries: Array[Array[Int]],
    k: Int,
    ncent: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[mutable.TreeSet[(Long, Long)]]]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"k must be in [1, 65536], got $k")
  require(luts.nonEmpty && luts.length <= 65536,
    s"need 1..65536 query LUTs, got ${luts.length}")
  require(cellQueries.forall(_.forall(q => q >= 0 && q < luts.length)),
    "cellQueries indexes outside the LUT table")

  override def prettyName: String = "graft_pq_adc_cell_topk"
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
    val idv = first.eval(input)
    val cv = second.eval(input)
    val cellv = third.eval(input)
    if (idv != null && cv != null && cellv != null) {
      val cell = cellv.asInstanceOf[Int]
      if (cell >= 0 && cell < cellQueries.length) {
        val id = idv.asInstanceOf[Long]
        val codes = cv.asInstanceOf[ArrayData]
        val n = codes.numElements()
        val qs = cellQueries(cell)
        var i = 0
        while (i < qs.length) {
          val qi = qs(i)
          val lut = luts(qi)
          var acc = 0L
          var s = 0
          while (s < n) {
            acc += lut(s * ncent + codes.getInt(s))
            s += 1
          }
          insert(buf(qi), acc, id)
          i += 1
        }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): PqAdcCellTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PqAdcCellTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqAdcCellTopKAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}
