package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-`n`-gram shingle hashes: tokenize → sliding
  * windows → xxhash64 (Spark-compatible: UTF-8 bytes, seed 42) →
  * distinct, in one imperative pass. Bit-identical to
  * `Dedup.shingleHashes` (HOF) except for element ORDER (set semantics:
  * this returns first-occurrence order, the HOF version distinct-order —
  * both feed order-insensitive consumers: explode, Jaccard counts,
  * minima). */
case class ShingleHashes(child: Expression, shingleN: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftShingles", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): GenericArrayData = {
    val tokens = input.toString.trim.split("\\s+")
    val n = tokens.length
    val starts = math.max(n - (shingleN - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long](starts * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < starts) {
      sb.setLength(0)
      var k = i
      val end = math.min(i + shingleN, n)
      while (k < end) {
        if (k > i) sb.append(' ')
        sb.append(tokens(k))
        k += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      seen.add(XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ShingleHashes].getName, "graft_shingle_hashes")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_shingle_hashes expects (text, shingleN); got ${exprs.length} args")
    ShingleHashes(exprs.head,
      exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue())
  }
}
