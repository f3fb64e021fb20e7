package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_titlecase(s)` — exact CPython `str.title()` semantics
  * (reference `titlecase`, utils.py:122-128), which differ from Spark's
  * `initcap` in two ways `initcap` cannot express:
  *  - a cased letter is title-cased after ANY non-cased code point, not
  *    just whitespace (`o'neil` → `O'Neil`, `a1b` → `A1B`,
  *    `HELLO-world` → `Hello-World`);
  *  - the Unicode TITLECASE mapping is used, not UPPERCASE
  *    (`ǆungla` → `ǅungla`), and everything else is lower-cased
  *    (initcap leaves mid-word case alone after non-space separators).
  * "Cased" per Python: Lu, Ll, Lt — digits and modifier letters do not
  * hold case state. Vectors in OpsFunctionsSpec are CPython outputs.
  */
case class TitleCase(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_titlecase"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftTitle", this, classOf[TitleCase].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  private def isCased(cp: Int): Boolean =
    Character.isUpperCase(cp) || Character.isLowerCase(cp) ||
      Character.getType(cp) == Character.TITLECASE_LETTER

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    val sb = new java.lang.StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val out =
        if (isCased(cp)) {
          if (prevCased) Character.toLowerCase(cp) else Character.toTitleCase(cp)
        } else cp
      sb.appendCodePoint(out)
      prevCased = isCased(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): TitleCase =
    copy(child = newChild)
}

object TitleCase {
  val info: ExpressionInfo = new ExpressionInfo(classOf[TitleCase].getName, "graft_titlecase")
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"graft_titlecase expects (str); got ${exprs.length} args")
    TitleCase(exprs.head)
  }
}
