package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Char-trigram language identification with EXACT integer scoring —
  * the corpus-routing classifier a mixing/sharding pass needs actual
  * language labels from (the stopword-ratio heuristic in
  * `TextAnalysis.englishStopwordRatio` only gates English-ness).
  *
  * score(text, lang) = Σ over every consecutive 3-char window of the
  * lowercased text of weight(lang, trigram), with the integer weight
  * table bundled at `/graft/langid_trigrams.tsv`. The label is the
  * argmax language, ties broken lexicographically; a text matching no
  * modeled trigram (or null score everywhere) labels "und". Integer
  * sums make the whole computation replayable bit-for-bit in any
  * engine — the q99 oracle rebuilds it relationally in DuckDB from
  * the SAME interpolated weight table.
  *
  * Scale shape: one in-plan hash-map walk per row, O(len) — map-only,
  * no shuffle, no model broadcast (the table rides inside the
  * expression like every other graft_* kernel). Windows are Java
  * char (UTF-16) positions; the bundled model is BMP-only, where
  * UTF-16 and codepoint windows agree.
  */
object LangIdKernel {

  /** (sorted language codes, trigram → per-language weight vector). */
  val (langs: Array[String], weights: java.util.HashMap[String, Array[Long]]) = {
    val in = getClass.getResourceAsStream("/graft/langid_trigrams.tsv")
    require(in != null, "bundled langid model missing")
    val rows =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.replaceAll("[\r\n]+$", ""))
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val f = l.split('\t')
          require(f.length == 3, s"bad langid model line: '$l'")
          val g = f(1).replace('_', ' ')
          require(g.length == 3, s"langid trigram not 3 chars: '${f(1)}'")
          (f(0), g, f(2).toLong)
        }.toVector
      finally in.close()
    val ls = rows.map(_._1).distinct.sorted.toArray
    val idx = ls.zipWithIndex.toMap
    val m = new java.util.HashMap[String, Array[Long]]()
    rows.foreach { case (lang, g, w) =>
      m.computeIfAbsent(g, _ => new Array[Long](ls.length))(idx(lang)) += w
    }
    (ls, m)
  }

  /** The model as SQL VALUES rows `('lang','trigram',weight),...` so
    * oracle SQL interpolates the SAME bundled table — no drift. */
  def modelSqlValues: String = {
    val b = new StringBuilder
    val ls = langs
    val it = weights.entrySet().iterator()
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    while (it.hasNext) {
      val e = it.next()
      var i = 0
      while (i < ls.length) {
        if (e.getValue()(i) != 0L) rows += ((ls(i), e.getKey, e.getValue()(i)))
        i += 1
      }
    }
    rows.sortBy(r => (r._1, r._2)).foreach { case (l, g, w) =>
      if (b.nonEmpty) b.append(",")
      // double embedded quotes: a future model trigram containing an
      // apostrophe must not silently alter the interpolated oracle SQL
      val ge = g.replace("'", "''")
      b.append(s"('$l','$ge',$w)")
    }
    b.result()
  }

  /** (language, score); ("und", 0) when nothing matched. */
  def classify(text: String): (String, Long) = {
    if (text == null) return null
    val t = text.toLowerCase(java.util.Locale.ROOT)
    val scores = new Array[Long](langs.length)
    var i = 0
    val n = t.length - 2
    while (i < n) {
      val w = weights.get(t.substring(i, i + 3))
      if (w != null) {
        var j = 0
        while (j < w.length) { scores(j) += w(j); j += 1 }
      }
      i += 1
    }
    var best = -1; var bestScore = 0L
    var j = 0
    while (j < scores.length) { // first max wins = lexicographic tie-break
      if (scores(j) > bestScore) { best = j; bestScore = scores(j) }
      j += 1
    }
    if (best < 0) ("und", 0L) else (langs(best), bestScore)
  }
}

/** `graft_langid(text)` → struct<lang string, score bigint>. */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LangIdExpr.schema
  override def prettyName: String = "graft_langid"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftLangId", this,
      classOf[LangIdExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(text: UTF8String): InternalRow = {
    val (lang, score) = LangIdKernel.classify(text.toString)
    new GenericInternalRow(Array[Any](UTF8String.fromString(lang), score))
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {
  val schema: StructType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("score", LongType, nullable = false)))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[LangIdExpr].getName, "graft_langid")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"graft_langid expects (text); got ${exprs.length} args")
    LangIdExpr(exprs.head)
  }
}
