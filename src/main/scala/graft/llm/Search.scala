package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Keyword search over a document corpus ([EXT]): TF×(N/df) relevance
  * ranking — a BM25-lite without length normalization, chosen so every
  * score is derived from INTEGER counts through one division and one
  * rounding: per-term scores land in integer "micropoints"
  * (round(1e6·tf·N/df)) and sum EXACTLY, making the ranking
  * bit-identical in any engine regardless of aggregation order (a
  * float-sum score would be summation-order-dependent and could never
  * hash-match an oracle).
  */
object Search {

  /** Top-k documents for a bag of query terms.
    *
    * Output: (doc_id, score, n_terms) — micropoint score, number of
    * distinct query terms hit — ordered by (score desc, doc_id),
    * limited to `k`.
    *
    * Scale shape: the corpus scan is map-only — tokens are filtered to
    * the query terms BEFORE any shuffle, so exchanged volume ∝ term
    * matches, not corpus size. Then: one exchange on (doc, term) for
    * tf; df comes from a groupBy-count over tf (≤ |terms| rows — tf is
    * distinct per (doc, term), so the per-term row count IS document
    * frequency) broadcast-joined back, NOT a count window on term — a
    * window would buffer every document matching one term in a single
    * task, and a common term matches most of a 100 TB corpus. Then one
    * exchange on doc for the final score and a TakeOrderedAndProject
    * for the top-k (never a global sort). The corpus row count N joins
    * in as a broadcast 1-row aggregate — no driver-side action. */
  def keywordSearch(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "at least one query term required")
    val n = df.agg(count(lit(1)).as("n_docs"))
    val hits = df.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(terms.map(_.asInstanceOf[Any]): _*))
    val tf = hits.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df_t: bounded-state per-term count (map-side partial), broadcast
    // back — the df table has at most |terms| rows by construction.
    val dfPerTerm = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val dft = tf.join(broadcast(dfPerTerm), Seq("term"))
    dft.join(broadcast(n))
      .withColumn("micro",
        round(lit(1e6) * col("tf") * col("n_docs") / col("df_t"))
          .cast(LongType))
      .groupBy("doc_id")
      .agg(sum(col("micro")).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
