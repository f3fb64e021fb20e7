package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_phrase_hits(str)` over an embedded phrase blocklist: the
  * total NON-OVERLAPPING occurrence count across all phrases — the
  * substring tier of content blocklisting (the token-exact tier is
  * `TextAnalysis.blocklistFilter`; phrases with spaces or punctuation
  * need substring matching, which token joins can't express).
  *
  * Counting contract (chosen for engine portability): per phrase,
  * scan left-to-right and skip the phrase length after each match —
  * exactly `replace()` counting, so any engine replays it as
  * `(length(t) − length(replace(t, p, ''))) / length(p)` and the
  * phrase totals sum independently. Case-sensitive; callers lower()
  * both sides for case-folding.
  *
  * Cost is O(text · phrases) — the phrase list is a PARAMETER
  * (capped at 10⁴ in the helper), never data, so the scan is
  * map-only and codegen'd with zero shuffle; an Aho–Corasick
  * automaton is the documented upgrade path if blocklists ever reach
  * the 10⁵ tier where the per-phrase sweep dominates. */
case class PhraseHits(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  require(phrases.nonEmpty, "graft_phrase_hits: empty phrase list")
  require(phrases.forall(_.nonEmpty),
    "graft_phrase_hits: empty-string phrase")
  require(phrases.distinct.size == phrases.size,
    "graft_phrase_hits: duplicate phrases")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_phrase_hits"

  @transient private lazy val pU: Array[UTF8String] =
    phrases.map(UTF8String.fromString).toArray
  @transient private lazy val pLen: Array[Int] = pU.map(_.numChars())

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPhrases", this,
      classOf[PhraseHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(s: UTF8String): Int = {
    var total = 0
    var i = 0
    while (i < pU.length) {
      var from = 0
      var idx = s.indexOf(pU(i), from)
      while (idx >= 0) {
        total += 1
        from = idx + pLen(i)
        idx = s.indexOf(pU(i), from)
      }
      i += 1
    }
    total
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseHits =
    copy(child = newChild)
}

object PhraseHits {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PhraseHits].getName, "graft_phrase_hits")

  /** SQL form: `graft_phrase_hits(str, array('p1', 'p2', …))` — the
    * phrase array must be a foldable literal (it is a parameter of
    * the scan, not data). */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_phrase_hits expects (str, array<string>); got ${exprs.length} args")
    val arr = exprs(1)
    require(arr.foldable && arr.dataType.isInstanceOf[ArrayType] &&
      arr.dataType.asInstanceOf[ArrayType].elementType == StringType,
      "graft_phrase_hits: second argument must be a foldable array<string>")
    val phrases = arr.eval() match {
      case a: ArrayData =>
        val raw = a.toArray[UTF8String](StringType)
        require(!raw.contains(null),
          "graft_phrase_hits: phrase array must not contain NULL elements")
        raw.map(_.toString).toSeq
      case other =>
        throw new IllegalArgumentException(
          s"graft_phrase_hits: cannot fold phrase array from $other")
    }
    PhraseHits(exprs.head, phrases)
  }

}
