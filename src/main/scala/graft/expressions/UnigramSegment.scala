package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_unigram_segment(word)` → array<string>: Viterbi-best
  * segmentation of one word under a unigram piece model with EXACT
  * integer micro-unit log-scores — the segmentation kernel of
  * `TrainingOps.trainUnigram` (hard-EM E-step) and its serving-side
  * encoder.
  *
  * DP: best(i) = max over piece lengths l ≤ maxPieceLen of
  * best(i−l) + score(word[i−l..i]) for pieces present in the model;
  * candidates compare by (score, then LONGER last piece) — an exact
  * integer total order per position (two candidates at one position
  * with equal length are the same piece), so the argmax is
  * deterministic across engines and replayable as a relational DP
  * (the q174 oracle unrolls exactly this recurrence with DuckDB
  * `max(struct(s, l))`). A word with an unreachable position (some
  * character is not in the model) returns NULL — the trainer never
  * produces such a model (single characters are always retained),
  * so NULL marks out-of-alphabet input rather than throwing.
  *
  * Scale shape: the piece table rides inside the expression like the
  * BPE merge table (parameter-bounded — no shuffle, no broadcast
  * variable); per-word cost is O(len · maxPieceLen) hash probes.
  * Map-only, codegen'd via reference object. */
case class UnigramSegmentExpr(child: Expression,
    pieces: Seq[(String, Long)], maxPieceLen: Int)
  extends UnaryExpression {

  require(maxPieceLen >= 1, "maxPieceLen must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_unigram_segment"

  @transient private lazy val score: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    pieces.foreach { case (p, s) => m.put(p, s) }
    m
  }

  def segment(word: UTF8String): ArrayData = {
    val w = word.toString
    val segs = UnigramSegmentExpr.viterbi(w, score, maxPieceLen)
    if (segs == null) null
    else {
      val out = new Array[Any](segs.size)
      var i = 0
      while (i < segs.size) {
        out(i) = UTF8String.fromString(segs.get(i)); i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftUniSeg", this,
      classOf[UnigramSegmentExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.segment($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSegmentExpr {

  /** The shared Viterbi core (also used driver-side by the trainer's
    * prune step): best path over `w` under `score`, or null when some
    * position is unreachable. Tie-break: higher score, then longer
    * last piece. */
  private[graft] def viterbi(w: String,
      score: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): java.util.ArrayList[String] = {
    val n = w.length
    if (n == 0) return new java.util.ArrayList[String](0)
    val best = new Array[Long](n + 1)
    val choice = new Array[Int](n + 1)
    val reach = new Array[Boolean](n + 1)
    reach(0) = true
    var i = 1
    while (i <= n) {
      var bestS = Long.MinValue
      var bestL = 0
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        if (reach(i - l)) {
          val s = score.get(w.substring(i - l, i))
          if (s != null) {
            val cand = best(i - l) + s.longValue()
            // higher score wins; tie -> LONGER piece (l scans upward,
            // so >= prefers the later, longer candidate)
            if (bestL == 0 || cand > bestS || (cand == bestS && l > bestL)) {
              bestS = cand; bestL = l
            }
          }
        }
        l += 1
      }
      if (bestL > 0) { reach(i) = true; best(i) = bestS; choice(i) = bestL }
      i += 1
    }
    if (!reach(n)) return null
    val rev = new java.util.ArrayList[String]()
    var p = n
    while (p > 0) { rev.add(w.substring(p - choice(p), p)); p -= choice(p) }
    val out = new java.util.ArrayList[String](rev.size)
    var k = rev.size - 1
    while (k >= 0) { out.add(rev.get(k)); k -= 1 }
    out
  }

  /** Total micro-score of the Viterbi-best path, or None when
    * unsegmentable — the prune step's "alternative segmentation"
    * likelihood. */
  private[graft] def viterbiScore(w: String,
      score: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): Option[Long] = {
    val segs = viterbi(w, score, maxPieceLen)
    if (segs == null) None
    else {
      var tot = 0L
      val it = segs.iterator()
      while (it.hasNext) tot += score.get(it.next()).longValue()
      Some(tot)
    }
  }
}
