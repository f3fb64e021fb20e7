package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native hyperplane-LSH signature: bit i = sign(vec · plane_i) folded
  * into a long bucket id. The plane matrix is generated at expression
  * construction from (dim, nPlanes, seed) with the same RNG sequence as
  * `Similarity.randomPlanes`, so the two formulations bucket
  * identically. Replaces an nPlanes × dim literal-array expression tree
  * (which bloats codegen) with one 2-D double array in the expression.
  */
case class HyperplaneSig(child: Expression, dim: Int, nPlanes: Int, seed: Long)
    extends UnaryExpression {

  private val planes: Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hplane_sig"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftHplane", this, classOf[HyperplaneSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(vec: ArrayData): Long = {
    val n = math.min(vec.numElements(), dim)
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val plane = planes(p)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += vec.getDouble(i) * plane(i); i += 1 }
      if (acc > 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HyperplaneSig].getName, "graft_hplane_sig")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4,
      s"graft_hplane_sig expects (vec, dim, nPlanes, seed); got ${exprs.length} args")
    def intArg(i: Int) = exprs(i)
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Number]
    HyperplaneSig(exprs.head, intArg(1).intValue(), intArg(2).intValue(),
      intArg(3).longValue())
  }
}

/** Native 64-bit SimHash of whitespace-tokenized text: per-token
  * xxhash64 (Spark-compatible: XXH64 over UTF-8 bytes, seed 42), each
  * bit votes ±1, sign of the vote forms the signature — identical
  * semantics to Dedup.simHash64's SQL formulation, one imperative pass.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSimhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): Long = {
    val tokens = input.toString.trim.split("\\s+")
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val bytes = tokens(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHash64].getName, "graft_simhash64")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"graft_simhash64 expects (text); got ${exprs.length} args")
    SimHash64(exprs.head)
  }
}
