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
}
