package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling ([EXT] — SURVEY.md §2.7): image/audio/
  * video payloads as opaque `binary` columns with typed metadata
  * structs, plus decode/feature-extraction plumbing.
  *
  * Decode tiers, honestly labeled:
  *  - container-header metadata: REAL, codec-free, and columnar — the
  *    native `graft_media_header` expression ([[parseMediaHeaders]]);
  *  - image pixels ([[decodeImage]]) and WAV PCM ([[decodeAudio]]):
  *    REAL decode via the JDK's built-in `javax.imageio.ImageIO`
  *    (PNG/JPEG/BMP/GIF) and `javax.sound.sampled` (WAV) — no external
  *    library needed;
  *  - video frame sampling: REAL for uncompressed RIFF/AVI 24-bpp DIB
  *    frames ([[sampleFrames]], kernel [[VideoKernel]] — raw-bitmap
  *    frames are plain bytes, same as BMP); compressed codecs (H.264,
  *    VP9, MJPEG) stay out of scope honestly — the JDK ships no video
  *    codec — with [[sampleFramesStub]] as the any-payload
  *    plumbing tier;
  *  - image resize: REAL via ImageIO + Graphics2D ([[resizeImage]]),
  *    with a deterministic any-payload stub kept for plumbing tests.
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
  val MediaHeaderSchema: StructType = graft.expressions.MediaHeaderExpr.schema

  /** Parse container headers COLUMNAR: the native `graft_media_header`
    * expression ([[graft.expressions.MediaHeaderExpr]], kernel:
    * [[MediaHeaderKernel]]) stays inside whole-stage codegen — no RDD
    * seam, no per-row deserialization, and Catalyst can prune/push
    * around it. Output: (id, format, width, height, channels,
    * sample_rate, bits_per_sample). Dimension/channel metadata drives
    * routing, filtering, and batch shaping long before pixel decode
    * runs. */
  def parseMediaHeaders(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val b = org.apache.spark.sql.GraftColumnBridge
    val h = b.column(graft.expressions.MediaHeaderExpr(
      b.expression(col(payloadCol))))
    df.select(col(idCol).as("id"), h.as("_h")).select(col("id"), col("_h.*"))
  }

  /** Feature row produced by the image decoders (real + stub). */
  val ImageFeatureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** The media ops pass `id` through untouched, so the output id field
    * takes the INPUT column's type — every other llm operator accepts
    * string doc-ids and the decoders must too (a `getLong` pin would
    * throw on them). */
  private def withIdType(schema: StructType, df: DataFrame,
      idCol: String): StructType =
    StructType(StructField("id", df.schema(idCol).dataType) +: schema.tail)

  /** REAL image decode + feature extraction via the JDK's
    * `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF — built into the JRE,
    * no external codec library).
    *
    * Pipeline shape: `mapPartitions` so each task amortizes reader
    * lookup across its batch; one fixed-width feature row per payload.
    * Features = 16-bin luminance histogram of the DECODED PIXELS
    * (ITU-R BT.601 luma from sRGB), normalized to sum 1 — deterministic
    * for a given image, independent of partitioning.
    *
    * Undecodable/corrupt payloads yield a row with null dims and null
    * features (never a throw — one bad file must not fail a 100 TB
    * task); filter on `width IS NULL` to route rejects. */
  def decodeImage(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.get(idIdx)
        val bytes = r.getAs[Array[Byte]](pIdx)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null) Row(id, null, null, null, null)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val hist = new Array[Float](16)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y) // sRGB regardless of storage model
              val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
                + 114 * (rgb & 0xff)) / 1000
              hist(lum / 16) += 1f
              x += 1
            }
            y += 1
          }
          val total = (w.toLong * h).toFloat
          Row(id, w, h, img.getColorModel.getNumComponents,
            hist.map(_ / total).toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, withIdType(ImageFeatureSchema, df, idCol))
  }

  /** Schema of [[imageDHash]]. */
  val DHashSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("dhash", LongType)))

  /** Perceptual difference-hash (dHash) over decoded image pixels —
    * the embedding-free image NEAR-DUP key: re-encodes, resizes and
    * small edits move few bits, so `bit_count(a ^ b) <= t` (Spark's
    * codegen'd `bit_count` on xor) is a Hamming near-dup predicate,
    * and the hash itself (or band substrings of it) is a bucket-join
    * blocking key — the exact SimHash discipline, pixel-side.
    *
    * Definition (exact integer arithmetic end-to-end, so an oracle
    * replays it relationally from known pixel values): sample a 9×8
    * grid by nearest-neighbor floor index (sx = col·w div 9,
    * sy = row·h div 8 — upsampling duplicates pixels for images
    * smaller than the grid, no interpolation on purpose), take
    * integer milli-luma 299·R + 587·G + 114·B per sample (no
    * division — exact), and set bit (row·8 + col) iff the right
    * neighbor is STRICTLY brighter. Same `mapPartitions` + ImageIO
    * shape as [[decodeImage]]; undecodable payloads → null fields.
    *
    * Scale shape: map-only, one decoded image in flight per row, 72
    * getRGB probes per image regardless of resolution. */
  def imageDHash(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.get(idIdx)
        val bytes = r.getAs[Array[Byte]](pIdx)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null) Row(id, null, null, null)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val lum = Array.ofDim[Int](8, 9)
          var row = 0
          while (row < 8) {
            var c = 0
            while (c < 9) {
              val rgb = img.getRGB(c * w / 9, row * h / 8)
              lum(row)(c) = 299 * ((rgb >> 16) & 0xff) +
                587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
              c += 1
            }
            row += 1
          }
          var hash = 0L
          row = 0
          while (row < 8) {
            var c = 0
            while (c < 8) {
              if (lum(row)(c + 1) > lum(row)(c))
                hash |= 1L << (row * 8 + c)
              c += 1
            }
            row += 1
          }
          Row(id, w, h, hash)
        }
      }
    }
    spark.createDataFrame(rdd, withIdType(DHashSchema, df, idCol))
  }

  /** Schema of [[audioFingerprint]]. */
  val AudioFingerprintSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("afp", LongType)))

  /** Audio fingerprint — the third leg of the near-dup triad (text
    * SimHash, image dHash, THIS): 64 energy-GRADIENT bits over a
    * 65-window RMS profile, bit w set iff window w+1 is STRICTLY
    * louder than window w. Re-encodes, level shifts (gain scales all
    * windows together) and small edits move few bits, so
    * `Dedup.hammingPairs64` over `afp` is the audio near-dup join.
    * Same decode path and `mapPartitions` shape as [[decodeAudio]]
    * (JDK WAV PCM); undecodable payloads → null fields.
    *
    * Window energies are RMS over equal sample slices — for
    * constant-amplitude windows the float math is EXACT (the value,
    * its square, and the correctly-rounded sqrt all land on
    * representable numbers), which is what lets the q130 oracle
    * replay the bits as pure integer amplitude comparisons. */
  def audioFingerprint(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val windows = 65
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.get(idIdx)
        val samples =
          try AudioKernel.decodePcm(r.getAs[Array[Byte]](pIdx))
          catch { case _: Exception => null }
        if (samples == null) Row(id, null, null, null)
        else {
          val (rate, _, mono) = samples
          val n = mono.length
          val energy = new Array[Float](windows)
          if (n > 0) {
            val per = math.max(1, (n + windows - 1) / windows)
            var w = 0
            while (w < windows) {
              val from = math.min(w * per, n)
              val to = math.min(from + per, n)
              var acc = 0.0
              var i = from
              while (i < to) { acc += mono(i) * mono(i); i += 1 }
              energy(w) =
                if (to > from) math.sqrt(acc / (to - from)).toFloat else 0f
              w += 1
            }
          }
          var afp = 0L
          var w = 0
          while (w < 64) {
            if (energy(w + 1) > energy(w)) afp |= 1L << w
            w += 1
          }
          Row(id, rate, n.toLong, afp)
        }
      }
    }
    spark.createDataFrame(rdd, withIdType(AudioFingerprintSchema, df, idCol))
  }

  /** Schema of [[decodeAudio]]: PCM stream parameters + per-window RMS
    * energy profile (`windows` floats, payload-length-independent). */
  val AudioFeatureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("energy", ArrayType(FloatType))))

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV PCM —
    * built into the JRE). Decodes the stream to normalized [-1, 1]
    * samples (channels averaged) and emits a fixed-width per-window RMS
    * energy profile — the shape of a frame-energy/VAD pass.
    * Undecodable payloads → null fields, never a throw. */
  def decodeAudio(df: DataFrame, idCol: String, payloadCol: String,
      windows: Int = 8): DataFrame = {
    require(windows > 0, "windows must be positive")
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.get(idIdx)
        val samples =
          try AudioKernel.decodePcm(r.getAs[Array[Byte]](pIdx))
          catch { case _: Exception => null }
        if (samples == null) Row(id, null, null, null, null)
        else {
          val (rate, channels, mono) = samples
          val n = mono.length
          val energy = new Array[Float](windows)
          if (n > 0) {
            val per = math.max(1, (n + windows - 1) / windows)
            var w = 0
            while (w < windows) {
              val from = math.min(w * per, n)
              val to = math.min(from + per, n)
              var acc = 0.0
              var i = from
              while (i < to) { acc += mono(i) * mono(i); i += 1 }
              energy(w) = if (to > from) math.sqrt(acc / (to - from)).toFloat else 0f
              w += 1
            }
          }
          Row(id, rate, channels, n.toLong, energy.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, withIdType(AudioFeatureSchema, df, idCol))
  }

  /** STUB image "decode": byte-level deterministic fake with the same
    * schema and `mapPartitions` shape as [[decodeImage]] (the REAL
    * ImageIO tier). Kept because it works on ARBITRARY payloads (the
    * text-table fixtures aren't decodable images) and is bit-stable
    * for plumbing tests: "width"/"height" derive from byte length,
    * "features" is a 16-bin raw-byte histogram normalized to 1. */
  def decodeImageStub(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition "codec init" would go here (once per task, not per row)
      rows.map { r =>
        val id = r.get(idIdx)
        val bytes = r.getAs[Array[Byte]](pIdx)
        val n = bytes.length
        // real decoder: [[decodeImage]]; deterministic byte-level fake below
        val width = math.max(1, n % 1024)
        val height = math.max(1, n / math.max(1, width))
        val hist = new Array[Float](16)
        var i = 0
        while (i < n) { hist((bytes(i) & 0xff) / 16) += 1f; i += 1 }
        val total = math.max(1, n).toFloat
        Row(id, width, height, 3, hist.map(_ / total).toSeq)
      }
    }
    spark.createDataFrame(rdd, withIdType(ImageFeatureSchema, df, idCol))
  }

  /** Schema of [[sampleFrames]]: one row per sampled frame with its
    * index, the stream dims, and the same 16-bin luminance histogram
    * as [[decodeImage]] — so per-frame features feed the identical
    * downstream plumbing as still images. */
  val VideoFrameSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** REAL video frame sampling for uncompressed RIFF/AVI (24-bpp DIB
    * frames — kernel: [[VideoKernel]], zero codec libraries, the same
    * trick as the BMP pixel path). Emits every `every`-th frame's
    * 16-bin luminance histogram. Compressed codecs stay out of scope
    * honestly (the JDK ships no video codec); the container walk,
    * frame indexing, sampling stride, and per-frame feature plumbing
    * here are codec-independent — a real codec swaps into the kernel
    * only. Undecodable/compressed payloads → one null row, never a
    * throw. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      every: Int = 1): DataFrame = {
    require(every >= 1, "every must be >= 1")
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.get(idIdx)
        val s =
          try VideoKernel.sampleFrames(r.getAs[Array[Byte]](pIdx), every)
          catch { case _: Exception => null }
        if (s == null) Iterator.single(Row(id, null, null, null, null, null))
        else s.frames.iterator.map { case (fi, hist) =>
          Row(id, fi, s.width, s.height, s.totalFrames, hist.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, withIdType(VideoFrameSchema, df, idCol))
  }

  /** Schema of [[videoFrameDHash]]. */
  val VideoDHashSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("total_frames", IntegerType),
    StructField("dhash", LongType)))

  /** Per-frame perceptual dHash over REAL uncompressed-AVI frames —
    * video near-dup via the frame tier: two videos sharing most
    * frame hashes (or a re-encode whose frames sit within a small
    * Hamming distance) pair up through `Dedup.hammingPairs64` on
    * (frame_idx, dhash) or on a per-video min/set-signature derived
    * from these rows. Same grid/luma/gradient definition as
    * [[imageDHash]], computed straight off the DIB bytes (see
    * [[VideoKernel.frameDHashes]] for the storage-row orientation
    * note). Undecodable payloads → one null row, never a throw. */
  def videoFrameDHash(df: DataFrame, idCol: String, payloadCol: String,
      every: Int = 1): DataFrame = {
    require(every >= 1, "every must be >= 1")
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.get(idIdx)
        val s =
          try VideoKernel.frameDHashes(r.getAs[Array[Byte]](pIdx), every)
          catch { case _: Exception => null }
        if (s == null) Iterator.single(Row(id, null, null, null, null, null))
        else s.frames.iterator.map { case (fi, hash) =>
          Row(id, fi, s.width, s.height, s.totalFrames, hash)
        }
      }
    }
    spark.createDataFrame(rdd, withIdType(VideoDHashSchema, df, idCol))
  }

  /** STUB frame sampling for ARBITRARY "video" payloads: split the
    * byte stream into `frames` equal chunks and emit one row per
    * sampled chunk with its hash. Kept alongside the REAL
    * [[sampleFrames]] (uncompressed AVI) because it works on any
    * payload — the plumbing-only tier for formats the kernel cannot
    * decode. */
  def sampleFramesStub(df: DataFrame, idCol: String, payloadCol: String,
      frames: Int = 4): DataFrame = {
    val chunk = length(col(payloadCol)) / frames
    df.select(col(idCol), posexplode(transform(sequence(lit(0), lit(frames - 1)),
        f => sha2(substr(col(payloadCol), (f * chunk + 1).cast(IntegerType),
          greatest(chunk, lit(1)).cast(IntegerType)), 256)))
      .as(Seq("frame_idx", "frame_hash")))
  }

  /** STUB byte-level "resize": emit a payload downsampled to
    * `targetBytes` by stride-sampling the byte stream, with
    * before/after sizes in the output schema. Works on arbitrary
    * payloads (unlike [[resizeImage]], the real ImageIO tier, which
    * needs decodable images) and is bit-deterministic: stride depends
    * only on payload length. The shape constraint both tiers share: a
    * resize is a (binary → binary) map with fresh metadata, so its
    * output feeds the same decode/feature plumbing. */
  def resizeImageStub(df: DataFrame, idCol: String, payloadCol: String,
      targetBytes: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("orig_bytes", LongType),
      StructField("payload", BinaryType),
      StructField("meta", MetaSchema)))
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.get(idIdx)
        val bytes = r.getAs[Array[Byte]](pIdx)
        // real resampler: [[resizeImage]]; deterministic stride below
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

  /** REAL image resize via the JDK (`ImageIO` decode → `Graphics2D`
    * bilinear rescale → PNG re-encode — all built into the JRE).
    * Output: (id, orig_width, orig_height, payload, meta) where payload
    * is the resized image as PNG and meta is fresh (size + content
    * hash of the NEW bytes). Undecodable payloads → null fields, never
    * a throw. Same (binary → binary) shape as [[resizeImageStub]], so
    * downstream decode/feature plumbing is tier-agnostic. */
  def resizeImage(df: DataFrame, idCol: String, payloadCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("orig_width", IntegerType),
      StructField("orig_height", IntegerType),
      StructField("payload", BinaryType),
      StructField("meta", MetaSchema)))
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.get(idIdx)
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](pIdx)))
          catch { case _: Exception => null }
        if (img == null) Row(id, null, null, null, null)
        else {
          val scaled = new java.awt.image.BufferedImage(
            targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = scaled.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(scaled, "png", bos)
          val out = bos.toByteArray
          val hash = java.security.MessageDigest.getInstance("SHA-256")
            .digest(out).map("%02x".format(_)).mkString
          Row(id, img.getWidth, img.getHeight, out,
            Row(s"mem://resized/$id", "image/png", out.length.toLong, hash))
        }
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
      // real per-window energy: [[decodeAudio]]; crc32 scaled to [0,1)
      // is the deterministic byte-level stand-in (division promotes to
      // double → cast back to the FloatType feature convention)
      ((crc32(win) % 1000L) / 1000.0).cast(FloatType)
    })
  }
}
