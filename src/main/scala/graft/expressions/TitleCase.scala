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
      if (isCased(cp)) {
        if (prevCased) sb.appendCodePoint(Character.toLowerCase(cp))
        else {
          val tc = Character.toTitleCase(cp)
          if (tc != cp) sb.appendCodePoint(tc)
          else {
            // title == self but the char may still have a ONE-TO-MANY
            // title mapping Java only exposes via String upper-casing
            // (ß → "SS" → "Ss"; ligatures ﬁ → "FI" → "Fi") — CPython
            // applies these from SpecialCasing, fuzz-locked here
            val up = new String(Character.toChars(cp))
              .toUpperCase(java.util.Locale.ROOT)
            if (up.length > 1) {
              sb.append(up.charAt(0))
              var k = 1
              while (k < up.length) {
                sb.append(Character.toLowerCase(up.charAt(k)))
                k += 1
              }
            } else sb.appendCodePoint(cp)
          }
        }
      } else sb.appendCodePoint(cp)
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

/** `graft_camel_to_snake(s)` — EXACT reference `camel_to_snake_case`
  * (utils.py:181-192), which a regexp_replace chain cannot express:
  * only ASCII `[A-Z]+` runs immediately followed by `[a-z0-9]` are
  * rewritten (run → `_init_last`, both lowercased; single letter →
  * `_x`); everything else — non-ASCII uppercase, trailing acronyms,
  * digits — passes through UNCHANGED, and only leading underscores are
  * stripped. Divergences from the old two-regex + global-lower
  * formulation were found by differential fuzz against the extracted
  * reference function (RefFunctionsFuzzSpec). */
case class CamelToSnakeRef(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_camel_to_snake"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCamel", this, classOf[CamelToSnakeRef].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    val m = CamelToSnakeRef.CamelRun.matcher(s)
    val sb = new java.lang.StringBuilder(s.length + 8)
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start())
      val word = m.group()
      if (word.length > 1)
        sb.append('_').append(word.substring(0, word.length - 1).toLowerCase)
          .append('_').append(Character.toLowerCase(word.charAt(word.length - 1)))
      else sb.append('_').append(Character.toLowerCase(word.charAt(0)))
      last = m.end()
    }
    sb.append(s, last, s.length)
    // Python .lstrip('_'): ALL leading underscores, incl. pre-existing
    var start = 0
    while (start < sb.length && sb.charAt(start) == '_') start += 1
    UTF8String.fromString(sb.substring(start))
  }

  override protected def withNewChildInternal(newChild: Expression): CamelToSnakeRef =
    copy(child = newChild)
}

object CamelToSnakeRef {
  // exactly the reference's `([A-Z]+)(?=[a-z0-9])` — ASCII classes
  private val CamelRun = java.util.regex.Pattern.compile("[A-Z]+(?=[a-z0-9])")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CamelToSnakeRef].getName, "graft_camel_to_snake")
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"graft_camel_to_snake expects (str); got ${exprs.length} args")
    CamelToSnakeRef(exprs.head)
  }
}
