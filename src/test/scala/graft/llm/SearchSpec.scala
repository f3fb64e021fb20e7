package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SearchSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark shuffle"),   // tf(spark)=3
    (2L, "spark window functions here"), // tf(spark)=1, tf(window)=1
    (3L, "window window seat please"),   // tf(window)=2
    (4L, "nothing relevant at all")
  ).toDF("id", "text")

  test("keywordSearch ranks by exact micropoint TF×(N/df) score") {
    val r = Search.keywordSearch(docs, "id", "text",
      terms = Seq("spark", "window"), k = 10).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("score"),
        x.getAs[Long]("n_terms")))
    // N=4; df(spark)=2, df(window)=2 ⇒ micro(term) = 1e6·tf·4/2 = 2e6·tf
    // doc1: 6e6 (spark×3); doc2: 2e6+2e6=4e6 over 2 terms; doc3: 4e6 one term
    assert(r.map(_._1).toSeq === Seq(1L, 2L, 3L)) // 4e6 tie → doc_id order
    assert(r.map(_._2).toSeq === Seq(6000000L, 4000000L, 4000000L))
    assert(r.map(_._3).toSeq === Seq(1L, 2L, 1L))
  }

  test("keywordSearch: k caps output; no-hit docs never appear") {
    val r = Search.keywordSearch(docs, "id", "text", Seq("spark"), k = 1)
      .collect()
    assert(r.length === 1 && r(0).getAs[Long]("doc_id") === 1L)
  }

  // scalar replay of bm25Search's per-row expression, same IEEE op order
  private def bm25Micro(tf: Long, dft: Long, n: Long, dl: Long,
      sumDl: Long): Long =
    math.round(1e6 *
      math.log(1.0 + (n - dft + 0.5) / (dft + 0.5)) *
      (tf * (1.2 + 1.0)) /
      (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl * n / sumDl)))

  test("bm25Search: idf + length normalization, micropoint-exact") {
    // all docs dl=4 ⇒ dl·N/sumDl = 1; df(spark)=df(window)=2, N=4
    val r = Search.bm25Search(docs, "id", "text",
      terms = Seq("spark", "window"), k = 10).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("score"),
        x.getAs[Long]("n_terms")))
    val m = (tf: Long) => bm25Micro(tf, 2, 4, 4, 16)
    // doc2 hits both terms once; tf saturation ranks it above doc1's tf=3
    assert(r.map(_._1).toSeq === Seq(2L, 1L, 3L))
    assert(r.map(_._2).toSeq === Seq(2 * m(1), m(3), m(2)))
    assert(r.map(_._3).toSeq === Seq(2L, 1L, 1L))
  }

  test("bm25Search: longer doc with equal tf scores lower (b > 0)") {
    val docs2 = Seq(
      (1L, "spark a b c"),
      (2L, "spark a b c d e f g h i j k l m n o")
    ).toDF("id", "text")
    val r = Search.bm25Search(docs2, "id", "text", Seq("spark"), k = 10)
      .collect().map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("score")))
    assert(r.map(_._1).toSeq === Seq(1L, 2L))
    assert(r(0)._2 === bm25Micro(1, 2, 2, 4, 20))
    assert(r(1)._2 === bm25Micro(1, 2, 2, 16, 20))
    assert(r(0)._2 > r(1)._2)
  }
  test("buildPostings: tf and sorted 0-based positions per (term, doc)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a  c a"),
      (2L, " b b "),
      (3L, "")
    ).toDF("id", "text")
    val got = Search.buildPostings(docs, "id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(got(("a", 1L)) === ((3L, "0,2,4")))
    assert(got(("b", 1L)) === ((1L, "1")))
    assert(got(("c", 1L)) === ((1L, "3")))
    assert(got(("b", 2L)) === ((2L, "0,1")))
    assert(!got.keySet.exists(_._2 == 3L)) // empty doc → no postings
    // position order deterministic under repartition
    val re = Search.buildPostings(docs.repartition(5), "id", "text")
      .orderBy("term", "doc_id").collect().toSeq
    assert(re === Search.buildPostings(docs, "id", "text")
      .orderBy("term", "doc_id").collect().toSeq)
  }

  test("rrfFuse: exact micro sums, n_lists, top-k cut, tiebreak") {
    import spark.implicits._
    val lex = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val den = Seq((2L, 1), (4L, 2)).toDF("doc_id", "rank")
    val got = Search.rrfFuse(Seq(lex, den), "doc_id", "rank", kRrf = 60)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_micro"),
        r.getAs[Long]("n_lists"))).toSeq
    // floor(1e6/61)=16393, /62=16129, /63=15873
    assert(got === Seq(
      (2L, 16129L + 16393L, 2L), // both lists — fused to the top
      (1L, 16393L, 1L),
      (4L, 16129L, 1L),
      (3L, 15873L, 1L)))
    // k cuts AFTER fusion; ties break on doc_id (docs 5,6 share rank
    // 4 → micro 15625 each, below doc3's 15873; only 5 makes the cut)
    val t1 = Seq((5L, 4), (6L, 4)).toDF("doc_id", "rank")
    val cut = Search.rrfFuse(Seq(lex, den, t1), "doc_id", "rank", k = 5)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(cut === Seq(2L, 1L, 4L, 3L, 5L))
    // kRrf=0: rank-1 contribution is the full 10⁶
    val k0 = Search.rrfFuse(Seq(den), "doc_id", "rank", kRrf = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(k0 === Seq((2L, 1000000L), (4L, 500000L)))
    intercept[IllegalArgumentException] {
      Search.rrfFuse(Seq.empty, "doc_id", "rank")
    }
  }
}
