package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** `graft_hll(hash, p)` — PORTABLE HyperLogLog distinct-count sketch
  * as a native `TypedImperativeAggregate`: the fixed-size companion to
  * [[KmvDistinctAgg]]. Where KMV keeps the k smallest hashes (8k bytes,
  * exact below k), HLL keeps 2^p one-byte registers — 64 bytes at p=6
  * buys ~13% relative error, and the state NEVER grows with the
  * distinct count, so a 100 TB corpus-wide cardinality costs one
  * 2^p-byte summary per (group, map partition) on the shuffle.
  *
  * Engine-portable, unlike `approx_count_distinct`: Spark's HLL++ state
  * is engine-private and can never hash-match an oracle. Here the child
  * is the ALREADY-HASHED value — the same SHA-256-derived 60-bit
  * non-negative long the KMV tiers use (`Sketches.hash60`) — and the
  * register update is the textbook Flajolet split, so any engine with
  * sha256 and bit ops reproduces every register bit-for-bit:
  *
  *   register index = h mod 2^p        (low p bits)
  *   w              = h div 2^p        (remaining W = 60-p bits)
  *   rho(w)         = S - bitLength(w) (S = W+1; rho = S when w = 0)
  *   register       = max rho seen
  *
  * Returns `struct<n_zero int, denom_scaled long>`: n_zero = empty
  * registers (the linear-counting audit signal), denom_scaled =
  * Σ_j 2^(S - M_j) — the harmonic-mean denominator Σ 2^-M_j scaled by
  * 2^S so it is an EXACT integer (max m·2^S = 2^61, fits a long). The
  * estimator itself lives in the Column layer (`Sketches.hllEstimate`)
  * as an exact 128-bit integer division, shared by both tiers.
  */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")

  private val m = 1 << p

  override def prettyName: String = "graft_hll"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_zero", IntegerType, nullable = false),
    StructField("denom_scaled", LongType, nullable = false)))

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      HllSketchAgg.updateRegs(buf, v.asInstanceOf[Long], p)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val (zeros, denom) = HllSketchAgg.summarize(buf, p)
    new GenericInternalRow(Array[Any](zeros, denom))
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

object HllSketchAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HllSketchAgg].getName, "graft_hll")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_hll expects (hash, p); got ${exprs.length} args")
    val p = exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue()
    HllSketchAgg(exprs.head, p)
  }

  /** Shared register update — one definition of the Flajolet split for
    * every HLL form (value aggregate, register aggregate, merge
    * aggregate, streaming monitor). */
  private[graft] def updateRegs(regs: Array[Byte], h: Long, p: Int): Unit = {
    val m = 1 << p
    val reg = (h % m).toInt
    val rho = (61 - p) -
      (64 - java.lang.Long.numberOfLeadingZeros(h / m))
    if (rho > regs(reg)) regs(reg) = rho.toByte
  }

  private[graft] def summarize(regs: Array[Byte], p: Int): (Int, Long) = {
    val bigS = 61 - p
    var zeros = 0
    var denom = 0L
    var i = 0
    while (i < regs.length) {
      if (regs(i) == 0) zeros += 1
      denom += 1L << (bigS - regs(i))
      i += 1
    }
    (zeros, denom)
  }
}

/** `graft_hll_regs(hash, p)` — the same sketch as [[HllSketchAgg]] but
  * returning the RAW 2^p register bytes instead of the summary: the
  * PERSISTABLE form. Write one row per shard (day, source, partition)
  * into a sketch table, then answer any coarser-grain cardinality
  * question later by max-merging stored registers with
  * [[HllMergeAgg]] — no re-scan of the data. Registers are a pure
  * function of the value set (SHA hash space), so the stored bytes
  * are engine-reproducible and merge-order-independent. */
case class HllRegsAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")

  override def prettyName: String = "graft_hll_regs"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](1 << p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllSketchAgg.updateRegs(buf, v.asInstanceOf[Long], p)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) {
      if (other(i) > buf(i)) buf(i) = other(i); i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegsAgg =
    copy(child = newChild)
}

object HllRegsAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HllRegsAgg].getName, "graft_hll_regs")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_hll_regs expects (hash, p); got ${exprs.length} args")
    val p = exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue()
    HllRegsAgg(exprs.head, p)
  }
}

/** `graft_hll_merge(regs, p)` — max-merge stored register blobs
  * ([[HllRegsAgg]] outputs) back into one sketch summary
  * `struct<n_zero int, denom_scaled long>`. Because register max is
  * associative, commutative and idempotent, ANY union of shard
  * sketches — across days, sources, retries — equals the sketch of
  * the unioned data, bit for bit. NULL blobs are skipped; a
  * wrong-size blob (different p) fails fast. */
case class HllMergeAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")

  override def prettyName: String = "graft_hll_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_zero", IntegerType, nullable = false),
    StructField("denom_scaled", LongType, nullable = false)))

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](1 << p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val other = v.asInstanceOf[Array[Byte]]
      require(other.length == buf.length,
        s"graft_hll_merge: register blob of ${other.length} bytes does " +
          s"not match p=$p (expected ${buf.length}) — sketches from a " +
          "different precision cannot merge")
      var i = 0
      while (i < buf.length) {
        if (other(i) > buf(i)) buf(i) = other(i); i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) {
      if (other(i) > buf(i)) buf(i) = other(i); i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val (zeros, denom) = HllSketchAgg.summarize(buf, p)
    new GenericInternalRow(Array[Any](zeros, denom))
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
}

object HllMergeAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HllMergeAgg].getName, "graft_hll_merge")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_hll_merge expects (regs, p); got ${exprs.length} args")
    val p = exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue()
    HllMergeAgg(exprs.head, p)
  }
}
