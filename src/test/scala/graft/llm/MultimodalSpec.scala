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

  test("resizeImageStub: bounded payload, fresh metadata, repartition-stable") {
    import spark.implicits._
    val big = Seq((1L, Array.tabulate(100000)(_.toByte)),
      (2L, Array.tabulate(100)(_.toByte))).toDF("id", "payload")
    val out = Multimodal.resizeImageStub(big, "id", "payload", targetBytes = 4096)
      .orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getLong(1) === 100000L) // orig size preserved in schema
    val resized = r1.getAs[Array[Byte]]("payload")
    assert(resized.length <= 8192 && resized.length >= 2048) // ~target, bounded
    assert(r1.getStruct(3).getAs[Long]("size_bytes") === resized.length.toLong)
    // small payloads pass through untouched
    assert(out(1).getAs[Array[Byte]]("payload").length === 100)
    // deterministic under repartitioning (stride depends on bytes only)
    val again = Multimodal.resizeImageStub(big.repartition(5), "id", "payload", 4096)
      .orderBy("id").collect()
    assert(again(0).getStruct(3).getAs[String]("content_hash")
      === r1.getStruct(3).getAs[String]("content_hash"))
  }

  test("audioFeaturesStub: fixed-width deterministic window profile") {
    import spark.implicits._
    val bin = Seq((1L, Array.tabulate(1000)(i => (i * 7).toByte)),
      (2L, Array.tabulate(1000)(i => (i * 13).toByte))).toDF("id", "payload")
    val feats = bin.select(col("id"),
        Multimodal.audioFeaturesStub("payload", windows = 8).as("f"))
      .orderBy("id").collect().map(_.getSeq[Float](1))
    assert(feats.forall(_.length === 8)) // schema independent of payload size
    assert(feats.forall(_.forall(v => v >= 0f && v < 1f)))
    assert(feats(0) !== feats(1)) // different payloads → different profiles
  }
}
