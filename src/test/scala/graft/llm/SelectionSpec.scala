package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SelectionSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark shuffle join agg spark spark"),
    (2L, "le chat noir dort sur le tapis le"),
    (3L, "spark join window sort spark"),
    (4L, "chat chien oiseau le la les"),
    (5L, "spark spark spark join"),
    (6L, "")
  ).toDF("id", "text")

  test("dsirScores: target-like docs outscore off-target docs; partition-invariant") {
    val target = docs.filter(col("id").isin(1L, 3L, 5L)) // "spark" domain
    val scored = Selection.dsirScores(docs, target, docs, "id", "text",
      numBuckets = 64)
    val m = scored.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // empty doc drops out (no tokens)
    assert(!m.contains(6L))
    assert(m(1L)._1 === 6) // token counts
    // every spark-domain doc outscores every french doc (normalized)
    val avg = m.map { case (id, (n, s)) => id -> s.toDouble / n }
    for (t <- Seq(1L, 3L, 5L); o <- Seq(2L, 4L))
      assert(avg(t) > avg(o), s"doc $t should outscore $o")
    // exact micro sums are partitioning-invariant
    val re = Selection.dsirScores(docs.repartition(5), target.repartition(3),
      docs.repartition(2), "id", "text", numBuckets = 64)
    assert(scored.orderBy("id").collect().toSeq ===
      re.orderBy("id").collect().toSeq)
    intercept[IllegalArgumentException] {
      Selection.dsirScores(docs, target, docs, "id", "text", numBuckets = 0)
    }
  }

  test("dsirTopK: k highest scores, deterministic tie-break") {
    val scored = Seq((1L, 10L, 500L), (2L, 10L, 900L), (3L, 10L, 500L))
      .toDF("id", "n_tokens", "score_micro")
    val top = Selection.dsirTopK(scored, "id", 2).collect().map(_.getLong(0))
    assert(top.toSeq === Seq(2L, 1L)) // 900 first, then 500-tie → id 1
  }

  test("sampleWeightedK: without replacement, weight-sensitive, deterministic") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("w", when(col("id") < 100, 1000.0).otherwise(1.0))
    val got = Selection.sampleWeightedK(df, "id", "w", k = 50)
    val ids = got.collect().map(_.getLong(0))
    assert(ids.length === 50 && ids.distinct.length === 50)
    // heavy rows (100 of them at 1000× weight) dominate the sample
    assert(ids.count(_ < 100) > 40)
    // deterministic under repartition
    val re = Selection.sampleWeightedK(df.repartition(7), "id", "w", k = 50)
    assert(got.orderBy("id").collect().toSeq ===
      re.orderBy("id").collect().toSeq)
    // zero/negative/null weights excluded
    val bad = Seq((1L, 0.0), (2L, -3.0), (3L, 2.0)).toDF("id", "w")
    assert(Selection.sampleWeightedK(bad, "id", "w", k = 10)
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("upsampleToMixture: realized tokens track the target mixture") {
    val df = spark.range(0, 300).toDF("id")
      .withColumn("src", concat(lit("s"), pmod(col("id"), lit(3))))
      .withColumn("toks", lit(100L))
    val budget = 60000L // 2× the 30k corpus
    val up = Selection.upsampleToMixture(df, "id", "src", "toks",
      Map("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2), budget)
    val realized = up.join(df.select("id", "toks"), Seq("id")).groupBy("src")
      .agg(sum("toks").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // each source's realized tokens within 15% of budget·w
    assert(math.abs(realized("s0") - 30000L) < 4500)
    assert(math.abs(realized("s1") - 18000L) < 2700)
    assert(math.abs(realized("s2") - 12000L) < 1800)
    // epochs are contiguous 1..n per id
    val e = up.filter(col("id") === 0L).select("epoch")
      .collect().map(_.getInt(0)).sorted
    assert(e.toSeq === (1 to e.length))
    // unknown source drops out
    val up2 = Selection.upsampleToMixture(df, "id", "src", "toks",
      Map("s0" -> 1.0), 20000L)
    assert(up2.select("src").distinct().collect().map(_.getString(0)).toSeq
      === Seq("s0"))
    // runaway repeat factor fails loudly
    intercept[IllegalArgumentException] {
      Selection.upsampleToMixture(df, "id", "src", "toks",
        Map("s0" -> 1.0), budgetTokens = 1000000000L)
        .count()
    }
  }
}
