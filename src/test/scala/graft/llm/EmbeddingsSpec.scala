package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

class EmbeddingsSpec extends SparkSuite {
  import spark.implicits._

  test("l2Normalize: unit norm, zero vector stays zero, null propagates") {
    val df = Seq(
      (1L, Some(Seq(3f, 4f))),
      (2L, Some(Seq(0f, 0f))),
      (3L, Option.empty[Seq[Float]]))
      .toDF("id", "v")
      .select(col("id"), Embeddings.l2Normalize(col("v")).as("n"))
      .orderBy("id").collect()
    assert(df(0).getSeq[Double](1) === Seq(0.6, 0.8))
    assert(df(1).getSeq[Double](1) === Seq(0.0, 0.0))
    assert(df(2).isNullAt(1))
  }

  test("quantizeInt8: max element hits ±127, zero vector → scale 0") {
    val rows = Embeddings.quantizeInt8(
        Seq((1L, Seq(2f, -4f, 1f)), (2L, Seq(0f, 0f, 0f))).toDF("id", "v"),
        "id", "v")
      .orderBy("id", "idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // id 1: maxabs 4 → scale 31.75 → q = [64, -127, 32] (round(63.5)=64)
    assert(rows.take(3).map(t => (t._2, t._3)).toSeq
      === Seq((0, 64), (1, -127), (2, 32)))
    assert(rows(0)._4 === 31750000L) // scale_micro = 127/4 · 1e6
    // zero vector: every qval 0 at scale 0
    assert(rows.drop(3).forall(t => t._3 === 0 && t._4 === 0L))
  }

  test("quantizeInt8: reconstruction error bounded by half a step") {
    val vec = Seq(0.91f, -0.33f, 0.005f, 0.77f, -1.2f, 0.0f)
    val rows = Embeddings.quantizeInt8(Seq((1L, vec)).toDF("id", "v"), "id", "v")
      .orderBy("idx").collect()
    val scale = rows(0).getLong(3) / 1e6
    rows.foreach { r =>
      val recon = r.getInt(2) / scale
      val orig = vec(r.getInt(1)).toDouble
      // |x − q/scale| ≤ 0.5/scale (+ micro-unit slack on the scale)
      assert(math.abs(recon - orig) <= 0.5 / scale + 1e-4,
        s"idx ${r.getInt(1)}: $recon vs $orig")
    }
  }
}
