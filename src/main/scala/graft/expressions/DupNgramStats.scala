package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_dup_ngrams(text, n)` → struct<n_ngrams int, top_cnt int,
  * top_gram string, top_chars bigint, dup_chars bigint> — the native
  * kernel behind `TextAnalysis.dupNgramStats` (see that Scaladoc for
  * the signal semantics and the Gopher overlap-estimator caveat).
  *
  * The first implementation was a sorted-run `aggregate` fold over
  * HOF-built n-gram arrays: semantically right, but interpreted HOF
  * expressions sit outside whole-stage codegen and the measured cost
  * was ~108 µs/doc at 1M docs (two folds per row). This kernel is
  * the same contract as one O(len) hash-count pass per row — single
  * tokenize, single n-gram walk, one HashMap the size of the row's
  * distinct n-grams — and drops the scenario to per-row
  * hash-map-walk cost like the langid kernel. Tokenization matches
  * `TextAnalysis.tokens` exactly: whitespace split, empty tokens
  * dropped (leading/trailing whitespace yields empties that the
  * filter removes in both formulations).
  *
  * Tie-break: the lexicographically SMALLEST gram among maximal
  * counts wins the top slot — identical to the oracle's
  * `ORDER BY cnt DESC, gram`. */
case class DupNgramStatsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n must be positive")

  override def dataType: DataType = DupNgramStatsExpr.schema
  override def prettyName: String = "graft_dup_ngrams"

  def compute(text: UTF8String): InternalRow = {
    val toks0 = text.toString.split("\\s+")
    var nTok = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) nTok += 1; i += 1 }
    val toks = new Array[String](nTok)
    var j = 0
    i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) { toks(j) = toks0(i); j += 1 }
      i += 1
    }
    val nGrams = toks.length - n + 1
    if (nGrams <= 0)
      return new GenericInternalRow(Array[Any](0, 0, null, 0L, 0L))
    val counts = new java.util.HashMap[String, Integer](nGrams * 2)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val g = sb.toString
      val prev = counts.get(g)
      counts.put(g, if (prev == null) 1 else prev.intValue() + 1)
      i += 1
    }
    var topCnt = 0
    var topGram: String = null
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue()
      if (c > topCnt || (c == topCnt && e.getKey.compareTo(topGram) < 0)) {
        topCnt = c; topGram = e.getKey
      }
      // char = codepoint, matching SQL length() in Spark and DuckDB
      // (Java's .length is UTF-16 units and diverges past the BMP)
      if (c >= 2) dupChars +=
        c.toLong * e.getKey.codePointCount(0, e.getKey.length)
    }
    new GenericInternalRow(Array[Any](nGrams, topCnt,
      UTF8String.fromString(topGram),
      topCnt.toLong * topGram.codePointCount(0, topGram.length), dupChars))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftDupNgrams", this,
      classOf[DupNgramStatsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DupNgramStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_ngrams", IntegerType, nullable = false),
    StructField("top_cnt", IntegerType, nullable = false),
    StructField("top_gram", StringType, nullable = true),
    StructField("top_chars", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false)))
}
