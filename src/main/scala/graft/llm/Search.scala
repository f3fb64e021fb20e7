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

  /** Full Okapi BM25 top-k: per-(doc, term) score
    * `idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))` with
    * `idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`, rounded to integer
    * micropoints BEFORE the per-doc sum — so the sum is exact long
    * arithmetic and the ranking is engine-portable (the per-row
    * double expression has ONE evaluation order, mirrored verbatim in
    * the oracle SQL; only the already-rounded longs aggregate).
    * `dl/avgdl` is computed as `dl·N/sumDl` so the only corpus-global
    * inputs are two exact longs. Unlike [[keywordSearch]] (integer
    * counts only), the idf term needs `ln` — correctly-rounded-to-
    * ~1-ulp in both engines' libms, so a micropoint could differ only
    * when 10⁶·idf·tfNorm lands within an ulp of a half-integer: the
    * same measure-zero exposure q89/q99 accept for `ln`.
    *
    * Scale shape (same skeleton as [[keywordSearch]]): corpus stats
    * (N, Σdl) are ONE map-only 1-row aggregate, broadcast back; docs
    * are filtered to those overlapping the query terms BEFORE any
    * shuffle (`arrays_overlap` is map-side), so exchanged volume ∝
    * matching docs; dl rides the groupBy key (functionally dependent
    * on doc_id) instead of a corpus-sized join; per-term df is a
    * bounded ≤|terms|-row aggregate broadcast back — never a count
    * window, which would buffer every document matching a common term
    * in one task; top-k is TakeOrderedAndProject, never a global
    * sort. */
  def bm25Search(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int = 20, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "at least one query term required")
    val toks = TextAnalysis.tokens(col(textCol))
    val stats = df.agg(count(lit(1)).as("n_docs"),
      sum(size(toks)).as("sum_dl"))
    val hits = df
      .filter(arrays_overlap(toks, array(terms.map(lit): _*)))
      .select(col(idCol).as("doc_id"), size(toks).as("dl"),
        explode(toks).as("term"))
      .filter(col("term").isin(terms.map(_.asInstanceOf[Any]): _*))
    val tf = hits.groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val dfPerTerm = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val k1c = lit(k1)
    val bc = lit(b)
    tf.join(broadcast(dfPerTerm), Seq("term"))
      .join(broadcast(stats))
      .withColumn("micro",
        round(lit(1e6) *
          log(lit(1.0) + (col("n_docs") - col("df_t") + lit(0.5)) /
            (col("df_t") + lit(0.5))) *
          (col("tf") * (k1c + lit(1.0))) /
          (col("tf") + k1c * ((lit(1.0) - bc) +
            bc * col("dl") * col("n_docs") / col("sum_dl"))))
        .cast(LongType))
      .groupBy("doc_id")
      .agg(sum(col("micro")).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Inverted-index EXPORT: the postings table (term, doc_id, tf,
    * positions) a serving-side search index is bulk-loaded from —
    * the materialization step after the in-engine ranking ops
    * ([[topK]]/BM25) prove the corpus is worth indexing. Positions
    * are 0-based whitespace-token offsets, emitted as a
    * comma-joined ascending string (a portable column any loader
    * parses; an array column would make the export schema
    * engine-specific).
    *
    * Scale shape: posexplode is map-only; ONE exchange on
    * (term, doc_id) builds each posting. Per-posting state is
    * bounded by the document's own occurrence count of one term
    * (≤ doc length — the same per-doc bound every text kernel here
    * relies on), never by the term's corpus frequency: a stopword
    * with 10⁹ corpus occurrences still builds its postings in
    * parallel across docs. The collect_list is inside that bound;
    * sort_array makes the order deterministic under any shuffle. */
  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fuse N ranked candidate lists — typically a lexical ranker
    * (BM25) and a dense ranker (embedding cosine) — into one list by
    * `score(d) = Σ_lists 1/(kRrf + rank_list(d))`, the standard
    * rank-based fusion that needs NO score calibration between
    * rankers (ranks, not raw scores, so a micropoint BM25 and a
    * cosine fuse cleanly).
    *
    * Scores are integer micro-units — `10⁶ div (kRrf + rank)` floor-
    * divided per contribution, summed exactly — so the fused ranking
    * is bit-identical on any engine (a float 1/(k+r) sum would be
    * summation-order-dependent). With kRrf=60 (the paper's constant)
    * adjacent ranks stay distinguishable: 10⁶/61 = 16393 vs
    * 10⁶/62 = 16129.
    *
    * Scale shape: each input list is already top-k-bounded by its
    * ranker (TakeOrdered there), so this fusion runs over ≤ Σ kᵢ rows
    * — one union, ONE hash aggregate on doc_id, one TakeOrdered.
    * Never a window, never a driver collect; at 10⁹ queries × 2
    * lists the shape is identical per query key.
    *
    * Input lists: (idCol, rankCol) with rank 1-based. Output:
    * (doc_id, rrf_micro, n_lists) ordered by (rrf_micro desc,
    * doc_id), limited to `k`. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
      kRrf: Int = 60, k: Int = 20): DataFrame = {
    require(lists.nonEmpty, "at least one ranked list required")
    require(kRrf >= 0, s"kRrf must be non-negative, got $kRrf")
    // `div` = exact integral division (a long `/` is double division
    // in Spark and would reintroduce float rounding)
    val contrib = lists.map(_
        .select(col(idCol).as("doc_id"), col(rankCol).cast(LongType).as("_r"))
        .select(col("doc_id"),
          expr(s"1000000L div (${kRrf.toLong}L + _r)").as("_c")))
      .reduce(_ unionByName _)
    contrib.groupBy("doc_id")
      .agg(sum(col("_c")).as("rrf_micro"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(k)
  }

  def buildPostings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"),
        array_join(transform(sort_array(collect_list(col("pos"))),
          _.cast(StringType)), ",").as("positions"))
}
