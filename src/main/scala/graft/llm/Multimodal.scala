package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling ([EXT] — SURVEY.md §2.7): image/audio/
  * video payloads as opaque `binary` columns with typed metadata
  * structs, plus decode/feature-extraction plumbing.
  *
  * The Spark-side plumbing — schema, batching, partition-parallel
  * decode — is real and tested. The codec step itself is a
  * deterministic STUB (image/audio libraries are not in this
  * environment): [[decodeImageStub]] derives features from the raw
  * bytes. Swapping in a real decoder changes only the function body
  * passed to `mapPartitions`, not the pipeline shape.
  */
object Multimodal {

  /** Metadata struct carried alongside every binary payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("mime", StringType),
    StructField("size_bytes", LongType),
    StructField("content_hash", StringType)))

  /** Ingest a directory of media files as (path, mod_time, payload,
    * meta) via Spark's binaryFile source — distributed, no driver IO.
    * `pathGlob` prunes at the file index (e.g. "*.png"). */
  def ingestBinaryDir(spark: SparkSession, dir: String,
      pathGlob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(dir)
      .select(col("path"), col("modificationTime").as("mod_time"),
        col("content").as("payload"))
      .withColumn("meta", attachMeta(col("payload"), col("path"), lit("application/octet-stream")))

  /** Build the metadata struct for a payload column. */
  def attachMeta(payload: Column, path: Column, mime: Column): Column =
    struct(
      path.as("path"),
      mime.as("mime"),
      length(payload).cast(LongType).as("size_bytes"),
      sha2(payload, 256).as("content_hash"))

  /** Wrap a string column as a binary payload + metadata — used to
    * exercise the multimodal plumbing against the text test tables. */
  def binaryFromText(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"))
      .withColumn("meta", attachMeta(col("payload"),
        concat(lit("mem://doc/"), col(idCol).cast(StringType)), lit("text/plain")))

  /** Media header metadata — REAL parsing, not a stub: container
    * headers are plain bytes, so no codec library is needed. Formats:
    * PNG (IHDR), GIF (logical screen), BMP (BITMAPINFOHEADER), WAV
    * (RIFF fmt chunk), JPEG (SOF0/1/2 marker scan). Unknown/truncated
    * payloads → format "unknown", null dims. */
  val MediaHeaderSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType)))

  /** Parse container headers partition-parallel. Output:
    * (id, format, width, height, channels, sample_rate,
    * bits_per_sample). This is the real half of the multimodal decode
    * story — dimension/channel metadata drives routing, filtering, and
    * batch shaping long before pixel decode runs. */
  def parseMediaHeaders(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(StructField("id", LongType) +: MediaHeaderSchema.fields.toSeq)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val h = MediaHeaderKernel.parse(r.getAs[Array[Byte]](pIdx))
        Row(r.getLong(idIdx), h.format,
          orNull(h.width), orNull(h.height), orNull(h.channels),
          orNull(h.sampleRate), orNull(h.bitsPerSample))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  private def orNull(v: Int): Any = if (v < 0) null else v

  /** Feature row produced by the (stubbed) image decoder. */
  val ImageFeatureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** STUB image decode + feature extraction.
    *
    * Real pipeline shape: `mapPartitions` so each task amortizes codec
    * init across its batch (the Scala analog of `mapInPandas` batch
    * processing); output is a fixed-width feature vector per row.
    *
    * STUB semantics (deterministic fake, no codec libs here): "width"/
    * "height" are parsed from byte length, "features" is a 16-bin byte
    * histogram normalized to 1 — stable across runs and partitionings.
    */
  def decodeImageStub(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition "codec init" would go here (once per task, not per row)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](pIdx)
        val n = bytes.length
        // ??? real decoder goes here; deterministic fake below
        val width = math.max(1, n % 1024)
        val height = math.max(1, n / math.max(1, width))
        val hist = new Array[Float](16)
        var i = 0
        while (i < n) { hist((bytes(i) & 0xff) / 16) += 1f; i += 1 }
        val total = math.max(1, n).toFloat
        Row(id, width, height, 3, hist.map(_ / total).toSeq)
      }
    }
    spark.createDataFrame(rdd, ImageFeatureSchema)
  }

  /** STUB frame sampling for "video" payloads: split the byte stream
    * into `frames` equal chunks and emit one row per sampled chunk with
    * its hash — the plumbing (explode to frame granularity, per-frame
    * downstream ops) is the real part. */
  def sampleFramesStub(df: DataFrame, idCol: String, payloadCol: String,
      frames: Int = 4): DataFrame = {
    val chunk = length(col(payloadCol)) / frames
    df.select(col(idCol), posexplode(transform(sequence(lit(0), lit(frames - 1)),
        f => sha2(substr(col(payloadCol), (f * chunk + 1).cast(IntegerType),
          greatest(chunk, lit(1)).cast(IntegerType)), 256)))
      .as(Seq("frame_idx", "frame_hash")))
  }

  /** STUB image resize: emit a payload downsampled to `targetBytes` by
    * stride-sampling the byte stream, with before/after dims in the
    * output schema. Real pipeline shape: a resize is a per-row payload
    * transform whose OUTPUT feeds the same decode/feature plumbing —
    * so it must stay a (binary → binary) map with metadata, which is
    * exactly what a real codec-backed resize would be. Deterministic:
    * stride depends only on payload length. */
  def resizeImageStub(df: DataFrame, idCol: String, payloadCol: String,
      targetBytes: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("orig_bytes", LongType),
      StructField("payload", BinaryType),
      StructField("meta", MetaSchema)))
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](pIdx)
        // ??? real resampling codec goes here; deterministic stride below
        val out =
          if (bytes.length <= targetBytes) bytes
          else {
            val stride = math.max(1, bytes.length / targetBytes)
            val resized = new Array[Byte]((bytes.length + stride - 1) / stride)
            var i = 0
            while (i < resized.length) { resized(i) = bytes(i * stride); i += 1 }
            resized
          }
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val hash = md.digest(out).map("%02x".format(_)).mkString
        Row(id, bytes.length.toLong, out,
          Row(s"mem://resized/$id", "application/octet-stream",
            out.length.toLong, hash))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** STUB audio feature extraction: fixed-width window energy profile
    * over the byte stream (`windows` values per payload) — the shape of
    * a real frame-energy/VAD pass: one fixed-length `Array[Float]` row
    * per payload, computed partition-parallel, schema independent of
    * payload size. */
  def audioFeaturesStub(payloadCol: String, windows: Int = 8): Column = {
    val p = col(payloadCol)
    val w = length(p) / windows
    transform(sequence(lit(0), lit(windows - 1)), i => {
      val win = substr(p, (i * w + 1).cast(IntegerType),
        greatest(w, lit(1)).cast(IntegerType))
      // ??? real per-window energy goes here; crc32 scaled to [0,1) is
      // the deterministic stand-in (division promotes to double → cast
      // back to the FloatType feature convention)
      ((crc32(win) % 1000L) / 1000.0).cast(FloatType)
    })
  }
}
