package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature expression — Catalyst tier (b) of the
  * custom-operator preference order (SURVEY.md §4): the higher-order-
  * function formulation (Dedup.minHashSignature) is semantically
  * identical but evaluates interpreted lambdas with per-element boxing;
  * this expression runs the whole tokenize → shingle → hash → minima
  * pipeline in one imperative JVM loop per row.
  *
  * Bit-for-bit compatible with the HOF version: shingle base hash =
  * Spark's `xxhash64(shingle_string)` (XXH64 over UTF-8 bytes, seed 42),
  * permutation j = `xxhash64(base ^ (j * 2654435761))` — so the two
  * implementations are interchangeable in any pipeline.
  *
  * doGenCode keeps the projection inside whole-stage codegen: the
  * generated code calls [[compute]] through a referenced instance —
  * no per-row boxing, no codegen span break.
  */
case class MinHashSig(child: Expression, numHashes: Int, shingleN: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash64"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftMinHash", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): ArrayData = {
    val text = input.toString
    val tokens = text.trim.split("\\s+")
    val n = tokens.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val starts = math.max(n - (shingleN - 1), 1)
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
      val base = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashLong(base ^ (j * 2654435761L), 42L)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `graft_band_fold(sig, bands, rowsPerBand)` — fold a MinHash
  * signature array into per-band bucket ids, bit-identical to the SQL
  * chain `aggregate(slice(sig, b·r+1, r), 1125899906842597L,
  * (acc, x) -> xxhash64(acc ^ x))` (XXH64.hashLong seed 42 IS Spark's
  * `xxhash64(long)`). One imperative pass instead of `bands`
  * interpreted aggregate lambdas per row — the banding step showed up
  * as the dominant cost in the 1M-doc scale smoke. */
case class BandFold(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_band_fold"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBandFold", this, classOf[BandFold].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(sig: ArrayData): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 1125899906842597L
      var j = 0
      while (j < rowsPerBand) {
        acc = XXH64.hashLong(acc ^ sig.getLong(b * rowsPerBand + j), 42L)
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): BandFold =
    copy(child = newChild)
}

object BandFold {
  val info: ExpressionInfo = new ExpressionInfo(classOf[BandFold].getName, "graft_band_fold")
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"graft_band_fold expects (sig, bands, rowsPerBand); got ${exprs.length} args")
    def intArg(i: Int) = exprs(i).eval(InternalRow.empty).asInstanceOf[Number].intValue()
    BandFold(exprs.head, intArg(1), intArg(2))
  }
}

/** `graft_sig_agreement(a, b)` — fraction of positions where two
  * signature arrays agree (the MinHash Jaccard estimate), for long AND
  * string signatures. One imperative pass per PAIR: the zip_with +
  * aggregate formulation it replaces ran ~64 interpreted lambda
  * invocations per joined candidate pair, which the 1M-doc scale smoke
  * measured as the dominant cost of the whole LSH pipeline (48s of a
  * 58s chain). */
case class SigAgreement(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_sig_agreement"

  // lazy: children are unresolved at construction time in the SQL path
  private lazy val elementIsString: Boolean = left.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSigAgree", this, classOf[SigAgreement].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.compute($l, $r);")
  }

  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var agree = 0
    var i = 0
    if (elementIsString) {
      while (i < n) {
        if (a.getUTF8String(i).equals(b.getUTF8String(i))) agree += 1
        i += 1
      }
    } else {
      while (i < n) {
        if (a.getLong(i) == b.getLong(i)) agree += 1
        i += 1
      }
    }
    agree.toDouble / n
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SigAgreement = copy(left = newLeft, right = newRight)
}

object SigAgreement {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SigAgreement].getName, "graft_sig_agreement")
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_sig_agreement expects (sigA, sigB); got ${exprs.length} args")
    SigAgreement(exprs.head, exprs(1))
  }
}

/** Native SHA-based MinHash signature — the portable (oracle-able) tier
  * of `graft_minhash64`, one imperative pass. Exactly
  * `Dedup.minHashSignatureShaSql`'s semantics: signature[j] = the
  * lexicographic minimum over shingles of `sha256(shingle || '|' || j)`
  * hex. Two structural savings over the HOF form, neither changing the
  * result: duplicate shingles are not deduped (minima are
  * duplication-invariant), and candidates compare as raw digest bytes
  * (hex is order-isomorphic to unsigned bytes) with only the final
  * minima hex-encoded. */
case class MinHashShaSig(child: Expression, numHashes: Int, shingleN: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_sha"

  // "|j" suffix bytes per permutation, built once per expression
  private val permSuffix: Array[Array[Byte]] =
    Array.tabulate(numHashes)(j => ("|" + j).getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftMinHashSha", this, classOf[MinHashShaSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(input: UTF8String): ArrayData = {
    val tokens = input.trim().toString.split("\\s+")
    val n = tokens.length
    val starts = math.max(n - (shingleN - 1), 1)
    val md = MinHashShaSig.digests.get()
    val mins = new Array[Array[Byte]](numHashes)
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
      val sBytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var j = 0
      while (j < numHashes) {
        md.update(sBytes)
        md.update(permSuffix(j))
        val d = md.digest()
        if (mins(j) == null || java.util.Arrays.compareUnsigned(d, mins(j)) < 0)
          mins(j) = d
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var j = 0
    while (j < numHashes) {
      out(j) = UTF8String.fromString(MinHashShaSig.hex(mins(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashShaSig =
    copy(child = newChild)
}

object MinHashShaSig {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("SHA-256"))

  private val hexChars = "0123456789abcdef".toCharArray

  private[expressions] def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xF)
      out(2 * i + 1) = hexChars(bytes(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashShaSig].getName, "graft_minhash_sha")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"graft_minhash_sha expects (text, numHashes, shingleN); got ${exprs.length} args")
    def intArg(i: Int) = exprs(i).eval(InternalRow.empty).asInstanceOf[Number].intValue()
    MinHashShaSig(exprs.head, intArg(1), intArg(2))
  }
}

object MinHashSig {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSig].getName, "graft_minhash64")

  /** SQL builder: graft_minhash64(text, numHashes, shingleN). */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"graft_minhash64 expects (text, numHashes, shingleN); got ${exprs.length} args")
    MinHashSig(exprs.head,
      exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue(),
      exprs(2).eval(InternalRow.empty).asInstanceOf[Number].intValue())
  }
}
