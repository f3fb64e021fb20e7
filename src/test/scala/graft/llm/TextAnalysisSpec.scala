package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): T =
    Seq(input).toDF("t").select(c).collect()(0).getAs[T](0)

  test("token counts: whitespace and BPE-ish") {
    assert(one[Int](TextAnalysis.tokenCountWs(col("t")), "a  b\tc") === 3)
    // "don't stop!" → [don]['][t][stop][!]
    assert(one[Int](TextAnalysis.tokenCountBpeish(col("t")), "don't stop!") === 5)
    assert(one[Int](TextAnalysis.tokenCountBpeish(col("t")), "abc123") === 2)
  }

  test("stopword and punct ratios") {
    assert(one[Double](TextAnalysis.stopwordRatio(col("t"), Seq("the", "a")),
      "the cat in a hat") === 0.4)
    assert(one[Double](TextAnalysis.punctRatio(col("t")), "ab!!") === 0.5)
  }

  test("qualityScore rewards prose, penalizes symbol noise") {
    val prose = one[Double](TextAnalysis.qualityScore(col("t")),
      "the engine reads a parquet file and writes the result to disk")
    val noise = one[Double](TextAnalysis.qualityScore(col("t")),
      "@@@@ #### $$$$ %%%% ^^^^ &&&&")
    assert(prose > noise)
    assert(prose > 0.5)
  }

  test("langIdHeuristic identifies stopword profiles; garbage → und") {
    assert(one[String](TextAnalysis.langIdHeuristic(col("t")),
      "the cat sat on the mat and it is warm") === "en")
    assert(one[String](TextAnalysis.langIdHeuristic(col("t")),
      "el gato y la casa de los vecinos en un pueblo") === "es")
    assert(one[String](TextAnalysis.langIdHeuristic(col("t")),
      "der Hund und die Katze ist von den Bäumen") === "de")
    assert(one[String](TextAnalysis.langIdHeuristic(col("t")),
      "le chat est dans la maison et les jardins") === "fr")
    assert(one[String](TextAnalysis.langIdHeuristic(col("t")),
      "zxqwv bnmpo qqq kjhgf") === "und")
  }

  test("fingerprint: stable, equal for equal text, shift-tolerant prefix") {
    val a = one[String](TextAnalysis.fingerprint(col("t"), 5),
      "one two three four five six seven eight")
    val b = one[String](TextAnalysis.fingerprint(col("t"), 5),
      "one two three four five six seven eight")
    assert(a === b && a.length === 64)
    // appending content can only lower (or keep) the min-hash
    val c = one[String](TextAnalysis.fingerprint(col("t"), 5),
      "one two three four five six seven eight nine ten")
    assert(c <= a)
  }
}
