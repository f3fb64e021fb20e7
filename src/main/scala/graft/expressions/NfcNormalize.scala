package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(str)` — Unicode NFC normalization (canonical
  * decomposition + canonical composition, `java.text.Normalizer`).
  *
  * Spark ships no normalization function, yet a multi-source text
  * corpus mixes composed ("é" U+00E9) and decomposed ("e"+U+0301)
  * forms of the same text — without NFC, exact/hash dedup silently
  * treats them as different documents and shingle/token statistics
  * double-count. Run it before any content-hash or shingle step.
  *
  * NFC (not NFKC) on purpose: canonical equivalence only — it never
  * changes what the text MEANS (NFKC folds ligatures, super/subscripts
  * and width variants, which is a lossy cleaning choice callers should
  * make explicitly). Engine-portable: DuckDB's `nfc_normalize` is the
  * oracle counterpart (q86). Fast path: `Normalizer.isNormalized` skip
  * check first — real corpora are overwhelmingly already-NFC, and the
  * check is a scan without allocation. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftNfc", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NfcNormalize].getName, "graft_nfc")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"graft_nfc expects (str); got ${exprs.length} args")
    NfcNormalize(exprs.head)
  }
}
