package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998)
  * as one grouped aggregate: per group (query), greedily select k
  * candidates maximizing λ·rel − (1−λ)·maxSim(c, selected) — the
  * diversified top-k a retrieval stage ends with when near-duplicate
  * hits would otherwise crowd the shortlist.
  *
  * State contract: the greedy needs the WHOLE shortlist before the
  * first pick, so the buffer holds every candidate of the group —
  * bounded by the operator's contract (this is a RE-RANK stage: its
  * input is a prior retrieval's top-N, and the caller's in-plan
  * `maxCandidates` guard fails by name before anything reaches the
  * buffer). Within that bound the greedy is O(k·n·dim) per group,
  * executor-side.
  *
  * Determinism: all arithmetic is engine-exact — rel is integer
  * micro by contract, sim = floor(cos·10⁶) with the dot computed as
  * nsub sequential slot-sums of dsub sequential terms (the q186
  * nested grouping the DuckDB oracle replays), score =
  * λ·rel − (10⁶−λ)·maxSim in longs; ties at every pick break to the
  * LOWER id. Zero-norm vectors contribute sim = 0 (a vector with no
  * direction certifies no redundancy — the semanticDedup rule). NULL
  * id/rel/vec rows are skipped.
  *
  * Output: array<struct<rank int, id long, mmr_micro long>> —
  * mmr_micro is the score AT SELECTION TIME (rank 1's is λ·rel). */
case class MmrTopKAgg(
    first: Expression,  // candidate id (long)
    second: Expression, // relevance, integer micro-units (long)
    third: Expression,  // embedding (array<double>)
    k: Int,
    lambdaMicro: Long,
    nsub: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Long, Array[Double])]]
  with TernaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"k must be in [1, 65536], got $k")
  require(lambdaMicro >= 0L && lambdaMicro <= 1000000L,
    s"lambdaMicro must be in [0, 1000000], got $lambdaMicro")
  require(nsub >= 1, s"nsub must be positive, got $nsub")

  override def prettyName: String = "graft_mmr_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("mmr_micro", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Long, Array[Double])] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(Long, Long, Array[Double])],
      input: InternalRow): mutable.ArrayBuffer[(Long, Long, Array[Double])] = {
    val idv = first.eval(input)
    val relv = second.eval(input)
    val vv = third.eval(input)
    if (idv != null && relv != null && vv != null) {
      val rel = relv.asInstanceOf[Long]
      // |rel| ≤ 9e12 makes every score term provably overflow-free:
      // λ·rel ≤ 10⁶·9·10¹² = 9·10¹⁸ < Long.MaxValue, and the
      // redundancy term adds at most (10⁶)² = 10¹² on top — an
      // unbounded rel would WRAP the ordering silently (relevance is
      // micro-units by contract; 9e12 is 9 million full-scale units
      // of headroom)
      if (math.abs(rel) > 9000000000000L)
        throw new IllegalArgumentException(
          s"graft_mmr_topk: relevance $rel exceeds |rel| <= 9e12 — " +
            "scores are micro-units by contract; rescale upstream")
      buf += ((idv.asInstanceOf[Long], rel,
        vv.asInstanceOf[ArrayData].toDoubleArray()))
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Long, Long, Array[Double])],
      other: mutable.ArrayBuffer[(Long, Long, Array[Double])]): mutable.ArrayBuffer[(Long, Long, Array[Double])] = {
    buf ++= other
    buf
  }

  /** Nested nsub×dsub sequential dot — the q186 grouping the oracle
    * replays bit for bit. */
  private def nestedDot(a: Array[Double], b: Array[Double]): Double = {
    val dsub = a.length / nsub
    var total = 0.0
    var s = 0
    while (s < nsub) {
      var p = 0.0
      var j = 0
      while (j < dsub) {
        p += a(s * dsub + j) * b(s * dsub + j)
        j += 1
      }
      total += p
      s += 1
    }
    total
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Long, Array[Double])]): Any = {
    val cands = buf.sortBy(_._1).toArray // id-sorted: stable greedy
    val n = cands.length
    val norms = cands.map(c => math.sqrt(nestedDot(c._3, c._3)))
    val selected = new Array[Boolean](n)
    // Long.MinValue = "nothing selected yet": the redundancy term is
    // only defined once something is picked, and the true max sim can
    // be NEGATIVE (cosines live in [-1, 1]) — clamping at 0 would
    // underpenalize... actually over-penalize anti-similar candidates
    // (a candidate pointing AWAY from everything picked earns a
    // diversity BONUS, which is exactly MMR's arithmetic)
    val maxSim = Array.fill(n)(Long.MinValue)
    val out = mutable.ArrayBuffer.empty[InternalRow]
    var r = 1
    val rounds = math.min(k, n)
    while (r <= rounds) {
      var best = -1
      var bestScore = Long.MinValue
      var i = 0
      while (i < n) {
        if (!selected(i)) {
          val score =
            if (maxSim(i) == Long.MinValue) lambdaMicro * cands(i)._2
            else lambdaMicro * cands(i)._2 -
              (1000000L - lambdaMicro) * maxSim(i)
          // strict >: equal scores keep the earlier (lower) id; the
          // best < 0 arm seats the FIRST unselected candidate even if
          // its score is Long.MinValue (otherwise best could stay -1
          // and selected(-1) would throw)
          if (best < 0 || score > bestScore) { bestScore = score; best = i }
        }
        i += 1
      }
      selected(best) = true
      out += new GenericInternalRow(
        Array[Any](r, cands(best)._1, bestScore))
      // fold the pick into every remaining candidate's redundancy
      var j = 0
      while (j < n) {
        if (!selected(j)) {
          val sim =
            if (norms(j) == 0.0 || norms(best) == 0.0) 0L
            else math.floor(nestedDot(cands(j)._3, cands(best)._3) /
              (norms(j) * norms(best)) * 1e6).toLong
          if (sim > maxSim(j)) maxSim(j) = sim
        }
        j += 1
      }
      r += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Long, Array[Double])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (id, rel, v) =>
      out.writeLong(id); out.writeLong(rel); out.writeInt(v.length)
      var j = 0
      while (j < v.length) { out.writeDouble(v(j)); j += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Long, Array[Double])] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Long, Long, Array[Double])]
    var i = 0
    while (i < n) {
      val id = in.readLong(); val rel = in.readLong()
      val len = in.readInt()
      val v = new Array[Double](len)
      var j = 0
      while (j < len) { v(j) = in.readDouble(); j += 1 }
      buf += ((id, rel, v))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MmrTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MmrTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): MmrTopKAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}
