package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_wordpiece_encode(word)` → array<string>: WordPiece greedy
  * longest-match-first segmentation of one whitespace token against a
  * trained vocabulary — the serving kernel of
  * `TrainingOps.trainWordPiece` and the published BERT WordPiece
  * algorithm (Devlin et al. 2019; the greedy matcher is specified in
  * the public BERT `tokenization.py` and HF tokenizers docs): at each
  * position take the LONGEST vocabulary piece matching the remaining
  * text, continuation positions match `##`-prefixed pieces; a word
  * with no match at some position — or longer than `maxWordLen`
  * (BERT's `max_input_chars_per_word`) — encodes as the single `unk`
  * token. Greedy is NOT total-coverage like the unigram Viterbi
  * ([[UnigramSegmentExpr]]): a training word can legitimately encode
  * to `unk` when a merge consumed the piece its greedy path needs
  * ("hugs" → [h, ##ug, ✗##s] once ##s merged into ##gs) — that is
  * the published algorithm's behavior, preserved bit-for-bit.
  *
  * Scale shape: the vocabulary rides inside the expression like the
  * BPE merge table (parameter-bounded — no shuffle, no broadcast
  * variable); per-word cost is O(len · maxRawLen) hash probes where
  * maxRawLen is the longest piece in the vocab (BERT caps the word
  * at 100 chars, so the worst case is bounded). Map-only, codegen'd
  * via reference object. */
case class WordPieceEncodeExpr(child: Expression, vocab: Seq[String],
    maxWordLen: Int, unk: String) extends UnaryExpression {

  require(maxWordLen >= 1, "maxWordLen must be positive")
  require(unk.nonEmpty, "unk token must be non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_wordpiece_encode"

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  /** Longest RAW length any piece can match (continuation pieces
    * contribute their length minus the `##` marker) — bounds the
    * inner longest-match scan. */
  @transient private lazy val maxRawLen: Int =
    if (vocab.isEmpty) 1
    else vocab.iterator
      .map(p => if (p.startsWith("##")) p.length - 2 else p.length)
      .max.max(1)

  def encode(word: UTF8String): ArrayData = {
    val w = word.toString
    val out = WordPieceEncodeExpr.greedy(w, vocabSet, maxRawLen,
      maxWordLen, unk)
    val arr = new Array[Any](out.size)
    var i = 0
    while (i < out.size) {
      arr(i) = UTF8String.fromString(out.get(i)); i += 1
    }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftWpEnc", this,
      classOf[WordPieceEncodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceEncodeExpr {

  /** The greedy longest-match core (shared with driver-side tests):
    * BERT WordPiece semantics — empty word → empty list; word longer
    * than `maxWordLen` or with an unmatchable position → [unk]. */
  private[graft] def greedy(w: String,
      vocab: java.util.HashSet[String], maxRawLen: Int,
      maxWordLen: Int, unk: String): java.util.ArrayList[String] = {
    val n = w.length
    val out = new java.util.ArrayList[String]()
    if (n == 0) return out
    if (n > maxWordLen) { out.add(unk); return out }
    var pos = 0
    while (pos < n) {
      var l = math.min(maxRawLen, n - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val sub = w.substring(pos, pos + l)
        val cand = if (pos == 0) sub else "##" + sub
        if (vocab.contains(cand)) hit = cand else l -= 1
      }
      if (hit == null) {
        out.clear(); out.add(unk); return out
      }
      out.add(hit)
      pos += l
    }
    out
  }
}
