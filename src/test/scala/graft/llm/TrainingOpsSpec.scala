package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

class TrainingOpsSpec extends SparkSuite {
  import spark.implicits._

  test("splitAssign: deterministic, exhaustive, roughly proportional") {
    val df = spark.range(0, 2000).toDF("id")
    val a = TrainingOps.splitAssign(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = a.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > 1400 && counts("train") < 1800) // ~1600
    assert(counts("val") > 100 && counts("val") < 320)
    // deterministic: same assignment on recompute and under repartition
    val b = TrainingOps.splitAssign(df.repartition(7), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(a.orderBy("id").collect().toSeq === b.orderBy("id").collect().toSeq)
    // different salt → different assignment (not id-correlated)
    val c = TrainingOps.splitAssign(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "other")
    assert(a.orderBy("id").collect().toSeq !== c.orderBy("id").collect().toSeq)
    intercept[IllegalArgumentException] {
      TrainingOps.splitAssign(df, "id", Seq("train" -> 0.5, "val" -> 0.1))
    }
  }

  test("packByTokenBudget: packs fill in order within shard, never cross shards") {
    val docs = Seq(
      (1L, "a", 300L), (2L, "a", 300L), (3L, "a", 300L), (4L, "a", 50L),
      (5L, "b", 600L), (6L, "b", 10L)
    ).toDF("id", "shard", "toks")
    val packed = TrainingOps.packByTokenBudget(docs, "shard", "id",
        col("toks"), budget = 512)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pack_id")).toMap
    // shard a offsets: 0, 300, 600, 900 → packs 0, 0, 1, 1
    assert(packed(1L) === 0L && packed(2L) === 0L)
    assert(packed(3L) === 1L && packed(4L) === 1L)
    // shard b restarts at 0 regardless of shard a's fill
    assert(packed(5L) === 0L && packed(6L) === 1L)
  }

  test("decontaminate: containment catches quoted benchmark items") {
    val corpus = Seq(
      (1L, "lots of filler text and then the secret benchmark question appears here verbatim today"),
      (2L, "completely unrelated corpus document with its own words entirely")
    ).toDF("id", "text")
    val probes = Seq(
      (100L, "the secret benchmark question appears here")
    ).toDF("id", "text")
    val hits = TrainingOps.decontaminate(corpus, probes, "id", "id", "text",
        shingleN = 3, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("corpus_id"), r.getAs[Long]("probe_id")) ->
        r.getAs[Double]("containment")).toMap
    // doc 1 contains the full probe → every probe shingle present
    assert(hits((1L, 100L)) === 1.0)
    assert(!hits.keySet.exists(_._1 == 2L))
    // plan shape: the probe index must be on the broadcast side
    val plan = TrainingOps.decontaminate(corpus, probes, "id", "id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }
}
