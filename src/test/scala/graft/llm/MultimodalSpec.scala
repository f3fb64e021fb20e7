package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "spark")).toDF("doc_id", "text")

  test("binaryFromText: payload bytes + typed metadata struct") {
    val r = Multimodal.binaryFromText(docs, "text", "doc_id")
      .orderBy("doc_id")
      .select(col("doc_id"), col("meta.size_bytes"), col("meta.mime"),
        col("meta.content_hash"), col("payload"))
      .collect()
    assert(r(0).getAs[Long](1) === 11L) // "hello world".getBytes.length
    assert(r(0).getAs[String](2) === "text/plain")
    // content hash = sha256 of the UTF-8 bytes
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val want = md.digest("hello world".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r(0).getAs[String](3) === want)
    assert(new String(r(0).getAs[Array[Byte]](4), "UTF-8") === "hello world")
  }

  test("decodeImageStub: deterministic features, stable schema, partition-parallel") {
    val bin = Multimodal.binaryFromText(docs, "text", "doc_id")
      .select(col("doc_id").as("id"), col("payload"))
    val f1 = Multimodal.decodeImageStub(bin, "id", "payload")
    assert(f1.schema === Multimodal.ImageFeatureSchema)
    val rows = f1.orderBy("id").collect()
    assert(rows.length === 2)
    val feats = rows(0).getSeq[Float](4)
    assert(feats.length === 16)
    assert(math.abs(feats.sum - 1.0f) < 1e-5) // normalized histogram
    // determinism across repartitioning (mapPartitions must not depend on layout)
    val f2 = Multimodal.decodeImageStub(bin.repartition(3), "id", "payload")
      .orderBy("id").collect()
    assert(f2.map(_.getSeq[Float](4)).toSeq === rows.map(_.getSeq[Float](4)).toSeq)
  }

  test("sampleFramesStub: one row per frame, deterministic hashes") {
    val bin = Multimodal.binaryFromText(docs, "text", "doc_id")
      .select(col("doc_id").as("id"), col("payload"))
    val frames = Multimodal.sampleFramesStub(bin, "id", "payload", frames = 4)
    assert(frames.count() === 8)
    val hashes = frames.filter(col("id") === 1).orderBy("frame_idx")
      .collect().map(_.getAs[String]("frame_hash"))
    assert(hashes.length === 4)
    assert(hashes.distinct.length === 4) // different chunks → different hashes
  }
}
