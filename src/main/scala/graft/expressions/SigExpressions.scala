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

/** Native 60-bit SHA-based SimHash — bit-identical to the portable SQL
  * formulation (`Dedup.simHashShaSql`, and therefore to the DuckDB
  * oracle): per-token hash = integer value of the first 15 hex chars of
  * sha256 (== the top 60 bits of the digest), each bit votes ±1. One
  * imperative pass replaces 60 interpreted lambda invocations per token
  * (measured 9× on q33). */
case class SimHashSha(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 60, s"bits must be in [1,60], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_sha"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSimhashSha", this, classOf[SimHashSha].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): Long = {
    // SQL-parity tokenization: trim is SPACE-only (SQL trim), split \s+
    val tokens = input.trim().toString.split("\\s+")
    val md = SimHashSha.digests.get()
    val votes = new Array[Int](bits)
    var t = 0
    while (t < tokens.length) {
      val d = md.digest(tokens(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // value of the first 15 hex chars == big-endian first 8 bytes >>> 4
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
      h >>>= 4
      var i = 0
      while (i < bits) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < bits) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSha =
    copy(child = newChild)
}

object SimHashSha {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("SHA-256"))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHashSha].getName, "graft_simhash_sha")

  def builder(exprs: Seq[Expression]): Expression = exprs.length match {
    case 1 => SimHashSha(exprs.head, 60)
    case 2 =>
      val bits = exprs(1).eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        .asInstanceOf[Number].intValue()
      SimHashSha(exprs.head, bits)
    case n => throw new IllegalArgumentException(
      s"graft_simhash_sha expects (text[, bits]); got $n args")
  }
}
