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

  test("MediaHeaderKernel parses real container headers (no codec libs)") {
    import MediaHeaderKernel.parse
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

    // PNG: sig + IHDR length/type + 640×480, color type 6 (RGBA)
    val png = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ "IHDR".getBytes ++
      bytes(0, 0, 2, 0x80, 0, 0, 1, 0xe0, 8, 6)
    val hp = parse(png)
    assert((hp.format, hp.width, hp.height, hp.channels) === (("png", 640, 480, 4)))

    // GIF89a 320×200 (little-endian u16)
    val gif = "GIF89a".getBytes ++ bytes(0x40, 0x01, 0xc8, 0x00, 0, 0, 0, 0)
    assert(parse(gif).copy() === MediaHeaderKernel.Header("gif", 320, 200))

    // BMP with top-down (negative) height -600, width 800
    val bmp = "BM".getBytes ++ new Array[Byte](16) ++
      bytes(0x20, 3, 0, 0) ++ bytes(0xa8, 0xfd, 0xff, 0xff) ++ new Array[Byte](4)
    val hb = parse(bmp)
    assert((hb.format, hb.width, hb.height) === (("bmp", 800, 600)))

    // WAV 2ch 44100Hz 16-bit, fmt NOT first (JUNK chunk before it)
    val junk = "JUNK".getBytes ++ bytes(4, 0, 0, 0) ++ new Array[Byte](4)
    val fmt = "fmt ".getBytes ++ bytes(16, 0, 0, 0) ++
      bytes(1, 0, 2, 0, 0x44, 0xac, 0, 0) ++ new Array[Byte](6) ++ bytes(16, 0)
    val wav = "RIFF".getBytes ++ bytes(0xff, 0, 0, 0) ++ "WAVE".getBytes ++ junk ++ fmt
    val hw = parse(wav)
    assert((hw.format, hw.channels, hw.sampleRate, hw.bitsPerSample)
      === (("wav", 2, 44100, 16)))

    // JPEG: SOI, APP0 skipped by length, then SOF0 1024×768, 3 channels
    val app0 = bytes(0xff, 0xe0, 0, 4, 0, 0)
    val sof0 = bytes(0xff, 0xc0, 0, 11, 8, 3, 0, 4, 0, 3)
    val jpg = bytes(0xff, 0xd8) ++ app0 ++ sof0
    val hj = parse(jpg)
    assert((hj.format, hj.width, hj.height, hj.channels) === (("jpeg", 1024, 768, 3)))

    // AVI: hdrl LIST whose avih carries 640×360 at body offsets 32/36
    val avih = "avih".getBytes ++ bytes(56, 0, 0, 0) ++
      new Array[Byte](32) ++ bytes(0x80, 2, 0, 0) ++ bytes(0x68, 1, 0, 0) ++
      new Array[Byte](16)
    val hdrl = "LIST".getBytes ++ bytes(4 + 64, 0, 0, 0) ++
      "hdrl".getBytes ++ avih
    val avi = "RIFF".getBytes ++ bytes(0xff, 0, 0, 0) ++ "AVI ".getBytes ++ hdrl
    val ha = parse(avi)
    assert((ha.format, ha.width, ha.height) === (("avi", 640, 360)))

    // crafted chunk size 0xFFFFFFF8 truncates to a NEGATIVE Int whose
    // word-aligned advance is zero — must terminate, not spin forever
    val evilWav = "RIFF".getBytes ++ bytes(0xff, 0, 0, 0) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ bytes(0xf8, 0xff, 0xff, 0xff) ++ new Array[Byte](16)
    assert(parse(evilWav).format === "wav")

    // zero-size JUNK padding chunks are legal RIFF: the walker must
    // advance past the 8-byte header, not abandon the metadata
    val junk0 = "JUNK".getBytes ++ bytes(0, 0, 0, 0)
    val wavJ0 = "RIFF".getBytes ++ bytes(0xff, 0, 0, 0) ++ "WAVE".getBytes ++
      junk0 ++ fmt
    val hwj = parse(wavJ0)
    assert((hwj.format, hwj.channels, hwj.sampleRate) === (("wav", 2, 44100)))
    val aviJ0 = "RIFF".getBytes ++ bytes(0xff, 0, 0, 0) ++ "AVI ".getBytes ++
      junk0 ++ hdrl
    val haj = parse(aviJ0)
    assert((haj.format, haj.width, haj.height) === (("avi", 640, 360)))
    // corrupt/truncated/unknown payloads never throw
    assert(parse(null).format === "unknown")
    assert(parse(bytes(1, 2, 3)).format === "unknown")
    assert(parse("GIF8".getBytes ++ bytes(1)).format === "unknown")
    assert(parse(bytes(0xff, 0xd8, 0x00, 0x11, 1, 1, 1, 1, 1, 1)).format === "jpeg")
  }

  test("MediaHeaderKernel parses MP4/MOV container metadata") {
    def parse(b: Array[Byte]) = MediaHeaderKernel.parse(b)
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ fcc(typ) ++ body

    def mp4(w: Int, h: Int, durMs: Long, frames: Int,
        brand: String = "isom"): Array[Byte] = {
      val ftyp = box("ftyp", fcc(brand) ++ be32(0x200))
      // mvhd v0: timescale 1000 → duration field IS milliseconds
      val mvhd = box("mvhd", new Array[Byte](12) ++ be32(1000) ++
        be32(durMs) ++ new Array[Byte](80))
      val tkhd = box("tkhd", be32(3) ++ new Array[Byte](8) ++ be32(1) ++
        be32(0) ++ be32(durMs) ++ new Array[Byte](52) ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16))
      val hdlr = box("hdlr", be32(0) ++ be32(0) ++ fcc("vide") ++
        new Array[Byte](13))
      val entry = be32(86) ++ fcc("avc1") ++ new Array[Byte](8) ++
        new Array[Byte](16) ++ be16(w) ++ be16(h) ++ new Array[Byte](50)
      val stsd = box("stsd", be32(0) ++ be32(1) ++ entry)
      val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(frames))
      val stbl = box("stbl", stsd ++ stsz)
      val minf = box("minf", stbl)
      val mdia = box("mdia", hdlr ++ minf)
      val trak = box("trak", tkhd ++ mdia)
      ftyp ++ box("moov", mvhd ++ trak)
    }

    val m = parse(mp4(640, 360, 12345L, 250))
    assert((m.format, m.width, m.height, m.durationMs, m.frameCount,
      m.codec) === (("mp4", 640, 360, 12345L, 250, "avc1")))
    // QuickTime brand → "mov"
    assert(parse(mp4(2, 2, 1L, 1, brand = "qt  ")).format === "mov")

    // soun trak: AudioSampleEntry channels/bits/rate
    val aentry = be32(36) ++ fcc("mp4a") ++ new Array[Byte](8) ++
      new Array[Byte](8) ++ be16(2) ++ be16(16) ++ be16(0) ++ be16(0) ++
      be16(44100) ++ be16(0)
    val atrak = box("trak",
      box("mdia", box("hdlr", be32(0) ++ be32(0) ++ fcc("soun") ++
          new Array[Byte](13)) ++
        box("minf", box("stbl", box("stsd", be32(0) ++ be32(1) ++ aentry)))))
    val ftypA = box("ftyp", fcc("isom") ++ be32(0x200))
    val a = parse(ftypA ++ box("moov", atrak))
    assert((a.format, a.channels, a.sampleRate, a.bitsPerSample, a.codec)
      === (("mp4", 2, 44100, 16, "mp4a")))

    // mvhd v1: u32 timescale @20, u64 duration @24
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      new Array[Byte](16) ++ be32(1000) ++ be32(0) ++ be32(98765L) ++
      new Array[Byte](80))
    val v1 = parse(ftypA ++ box("moov", mvhd1))
    assert((v1.format, v1.durationMs) === (("mp4", 98765L)))

    // mvhd v0 all-ones duration = "unknown" (ISO 14496-12 §8.2.2.3,
    // the fragmented-MP4/DASH init-segment convention) — must report
    // absent, not ~49.7 days
    val unk = parse(mp4(640, 360, 0xFFFFFFFFL, 250))
    assert(unk.durationMs === -1L)
    // mvhd v1 duration too large to scale to ms without overflow:
    // absent, never a wrapped garbage value
    val mvhdBig = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      new Array[Byte](16) ++ be32(1000) ++ be32(0x7fffffffL) ++
      be32(0xffffffffL) ++ new Array[Byte](80))
    assert(parse(ftypA ++ box("moov", mvhdBig)).durationMs === -1L)

    // corrupt arms: truncated moov, size<8, size-0 tail box, crafted
    // largesize — walk must terminate and never throw
    val good = mp4(4, 4, 10L, 2)
    assert(parse(good.take(40)).format === "mp4")       // truncated
    val evil = ftypA ++ be32(7) ++ fcc("moov")          // size < 8
    assert(parse(evil).format === "mp4")
    val zeroTail = ftypA ++ be32(0) ++ fcc("free") ++ new Array[Byte](8)
    assert(parse(zeroTail).format === "mp4")            // size 0 = to-end
    val largesize = ftypA ++ be32(1) ++ fcc("moov") ++
      be32(0xffffffffL) ++ be32(0xffffffffL)            // bogus u64 size
    assert(parse(largesize).format === "mp4")
    assert(parse(fcc("xxxx") ++ fcc("ftyp")).format === "unknown") // <12 B
  }

  test("parseMediaHeaders: partition-parallel, nulls for absent fields") {
    import spark.implicits._
    val png = Array[Byte](0x89.toByte) ++ "PNG".getBytes ++
      Array[Byte](0x0d, 0x0a, 0x1a, 0x0a, 0, 0, 0, 13) ++ "IHDR".getBytes ++
      Array[Byte](0, 0, 0, 16, 0, 0, 0, 16, 8, 2)
    val noise = Array.tabulate(64)(i => (i * 31).toByte)
    val df = Seq((1L, png), (2L, noise)).toDF("id", "payload").repartition(2)
    val out = Multimodal.parseMediaHeaders(df, "id", "payload")
      .orderBy("id").collect()
    assert(out(0).getAs[String]("format") === "png")
    assert(out(0).getAs[Int]("width") === 16 && out(0).getAs[Int]("channels") === 3)
    assert(out(0).isNullAt(out(0).fieldIndex("sample_rate"))) // image: no audio fields
    assert(out(1).getAs[String]("format") === "unknown")
    assert(out(1).isNullAt(out(1).fieldIndex("width")))
  }

  test("decodeImage: real ImageIO decode of a 2×2 PNG to known pixels") {
    import spark.implicits._
    // 2×2 RGB: black, white / pure red, pure blue — written by ImageIO
    // itself so the fixture is a REAL PNG, not hand-crafted bytes
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    img.setRGB(0, 1, 0xff0000); img.setRGB(1, 1, 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val junk = Array.tabulate(32)(_.toByte)
    val out = Multimodal.decodeImage(
        Seq((1L, png), (2L, junk)).toDF("id", "payload").repartition(2),
        "id", "payload")
      .orderBy("id").collect()
    val r = out(0)
    assert((r.getInt(1), r.getInt(2), r.getInt(3)) === ((2, 2, 3)))
    val feats = r.getSeq[Float](4)
    assert(feats.length === 16)
    // BT.601 luma: black=0→bin0, white=255→bin15, red=76→bin4, blue=29→bin1
    assert(feats(0) === 0.25f && feats(15) === 0.25f)
    assert(feats(4) === 0.25f && feats(1) === 0.25f)
    // undecodable payload → null dims/features, no throw
    assert(out(1).isNullAt(1) && out(1).isNullAt(4))
  }

  test("imageDHash: gradient hash from known pixels; robustness properties") {
    import spark.implicits._
    def png(f: java.awt.image.BufferedImage => Unit, w: Int = 16,
        h: Int = 16): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      f(img)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def hashOf(bytes: Array[Byte]): java.lang.Long = {
      val r = Multimodal.imageDHash(
        Seq((1L, bytes)).toDF("id", "payload"), "id", "payload").collect()(0)
      if (r.isNullAt(3)) null else Long.box(r.getLong(3))
    }
    // strictly left-to-right brighter ramp → every gradient bit set
    val ramp = png(img => for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, 0x010101 * (x * 16)))
    assert(hashOf(ramp) === -1L) // all 64 bits
    // constant image → no strict increase anywhere → 0
    val flat = png(img => for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, 0x808080))
    assert(hashOf(flat) === 0L)
    // scale invariance: the same ramp at 4× resolution hashes equal
    val ramp4x = png(img => for (y <- 0 until 64; x <- 0 until 64)
      img.setRGB(x, y, 0x010101 * ((x / 4) * 16)), 64, 64)
    assert(hashOf(ramp4x) === hashOf(ramp))
    // a small local edit moves few bits (near-dup property)
    val edited = png(img => {
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, 0x010101 * (x * 16))
      img.setRGB(0, 0, 0xffffff)
    })
    val d = java.lang.Long.bitCount(hashOf(ramp) ^ hashOf(edited))
    assert(d <= 4, s"hamming $d")
    // undecodable payload → null hash, no throw
    assert(hashOf(Array.tabulate(16)(_.toByte)) === null)
  }

  test("audioFingerprint: gradient bits from known windows; gain invariance") {
    import spark.implicits._
    def wav(amps: Int => Int, n: Int = 130): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
      def le16(v: Int): Unit = (0 until 2).foreach(i => bos.write((v >> (8 * i)) & 0xff))
      bos.write("RIFF".getBytes); le32(36 + n * 2)
      bos.write("WAVE".getBytes); bos.write("fmt ".getBytes); le32(16)
      le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
      bos.write("data".getBytes); le32(n * 2)
      (0 until n).foreach(i => le16(amps(i / 2) & 0xffff))
      bos.toByteArray
    }
    def fp(bytes: Array[Byte]): java.lang.Long = {
      val r = Multimodal.audioFingerprint(
        Seq((1L, bytes)).toDF("id", "payload"), "id", "payload").collect()(0)
      if (r.isNullAt(3)) null else Long.box(r.getLong(3))
    }
    // strictly rising energy ramp → all 64 bits
    assert(fp(wav(w => 10 + w * 50)) === -1L)
    // silence and constant level → 0
    assert(fp(wav(_ => 0)) === 0L)
    assert(fp(wav(_ => 1000)) === 0L)
    // gain invariance: scaling every window together preserves every
    // strict comparison, so the fingerprint is level-independent
    val shape = (w: Int) => (w * 37 + 11) % 301
    assert(fp(wav(w => shape(w))) === fp(wav(w => shape(w) * 8)))
    // undecodable payload → null, no throw
    assert(fp(Array.tabulate(16)(_.toByte)) === null)
  }

  test("media decode accepts string doc-ids like every other llm operator") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(1, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq(("doc-a", bos.toByteArray)).toDF("doc", "payload")
    val out = Multimodal.decodeImage(df, "doc", "payload").collect()
    assert(out.head.getString(0) === "doc-a" && out.head.getInt(1) === 1)
    assert(Multimodal.decodeImage(df, "doc", "payload")
      .schema("id").dataType === org.apache.spark.sql.types.StringType)
    // stubs and audio take the same passthrough id path
    val audio = Multimodal.decodeAudio(
      Seq(("doc-b", Array[Byte](1, 2, 3))).toDF("doc", "payload"),
      "doc", "payload")
    assert(audio.collect().head.getString(0) === "doc-b")
    val stub = Multimodal.decodeImageStub(df, "doc", "payload")
    assert(stub.collect().head.getString(0) === "doc-a")
    val rs = Multimodal.resizeImageStub(df, "doc", "payload")
    assert(rs.collect().head.getString(0) === "doc-a")
  }

  test("sampleFrames: real uncompressed-AVI frames to known histograms") {
    import spark.implicits._
    // hand-build a 2-frame 2×1 uncompressed AVI: frame 0 all black,
    // frame 1 all white — sampling every=2 must return ONLY frame 0
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val w = 2; val h = 1
    val rowBytes = ((w * 3 + 3) / 4) * 4 // 8
    def frame(value: Int): Array[Byte] =
      fcc("00db") ++ le32(rowBytes * h) ++
        Array.fill(w * 3)(value.toByte) ++ Array.fill(rowBytes - w * 3)(0.toByte)
    val strh = fcc("strh") ++ le32(56) ++ fcc("vids") ++ fcc("DIB ") ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++
      le32(2) ++ le32(0) ++ le32(0) ++ le32(0) ++ Array.fill(8)(0.toByte)
    val strf = fcc("strf") ++ le32(40) ++ le32(40) ++ le32(w) ++ le32(h) ++
      Array[Byte](1, 0, 24, 0) ++ le32(0) ++ le32(rowBytes * h) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strl = fcc("LIST") ++ le32(4 + strh.length + strf.length) ++
      fcc("strl") ++ strh ++ strf
    val avih = fcc("avih") ++ le32(56) ++ le32(40000) ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(2) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = fcc("LIST") ++ le32(4 + avih.length + strl.length) ++
      fcc("hdrl") ++ avih ++ strl
    val frames = frame(0) ++ frame(0xff)
    val movi = fcc("LIST") ++ le32(4 + frames.length) ++ fcc("movi") ++ frames
    val avi = fcc("RIFF") ++ le32(4 + hdrl.length + movi.length) ++
      fcc("AVI ") ++ hdrl ++ movi

    val out = Multimodal.sampleFrames(
        Seq((1L, avi), (2L, Array[Byte](1, 2, 3))).toDF("id", "payload"),
        "id", "payload", every = 2)
      .orderBy("id", "frame_idx").collect()
    assert(out.length === 2)
    val f0 = out(0)
    assert((f0.getInt(1), f0.getInt(2), f0.getInt(3), f0.getInt(4))
      === ((0, 2, 1, 2))) // frame 0 of 2, dims 2×1
    val hist = f0.getSeq[Float](5)
    assert(hist(0) === 1.0f) // all-black frame: every pixel in bin 0
    assert(out(1).isNullAt(1) && out(1).isNullAt(5)) // junk → null row
    // every=1 returns both frames; the white frame lands in bin 15
    val both = Multimodal.sampleFrames(
        Seq((1L, avi)).toDF("id", "payload"), "id", "payload", every = 1)
      .orderBy("frame_idx").collect()
    assert(both.length === 2 && both(1).getSeq[Float](5)(15) === 1.0f)
    // a COMPRESSED AVI (biCompression != 0) must refuse, not mis-decode
    val compressed = avi.clone()
    val strfDataOff = avi.indexOfSlice(fcc("strf")) + 8
    compressed(strfDataOff + 16) = 1 // biCompression = BI_RLE8
    val c = Multimodal.sampleFrames(
      Seq((1L, compressed)).toDF("id", "payload"), "id", "payload").collect()
    assert(c.length === 1 && c(0).isNullAt(1))
  }

  test("decodeAudio: real WAV PCM decode to known window energies") {
    import spark.implicits._
    // 16-bit mono 8kHz WAV via the JDK's own writer: first half a
    // constant +0.5 amplitude, second half silence → RMS 0.5 then 0.0
    val n = 8000
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    val amp = (0.5 * 32768).toInt.toShort // 16384
    var i = 0
    while (i < n / 2) { pcm(2 * i) = (amp & 0xff).toByte; pcm(2 * i + 1) = ((amp >> 8) & 0xff).toByte; i += 1 }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val out = Multimodal.decodeAudio(
        Seq((1L, wav), (2L, Array[Byte](1, 2, 3))).toDF("id", "payload"),
        "id", "payload", windows = 4)
      .orderBy("id").collect()
    val r = out(0)
    assert(r.getInt(1) === 8000 && r.getInt(2) === 1 && r.getLong(3) === n.toLong)
    val e = r.getSeq[Float](4)
    assert(e.length === 4)
    assert(math.abs(e(0) - 0.5f) < 1e-3 && math.abs(e(1) - 0.5f) < 1e-3)
    assert(e(2) === 0f && e(3) === 0f)
    assert(out(1).isNullAt(1) && out(1).isNullAt(4)) // not a WAV → nulls
  }

  test("resizeImage: real ImageIO+Graphics2D rescale, re-encoded PNG") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 4) img.setRGB(x, y, 0x00ff00) // green
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val out = Multimodal.resizeImage(
        Seq((1L, bos.toByteArray)).toDF("id", "payload"), "id", "payload",
        targetW = 2, targetH = 2)
      .collect()(0)
    assert(out.getInt(1) === 4 && out.getInt(2) === 4)
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]]("payload")))
    assert(resized.getWidth === 2 && resized.getHeight === 2)
    assert((resized.getRGB(0, 0) & 0xffffff) === 0x00ff00) // solid color survives
    assert(out.getStruct(4).getAs[Long]("size_bytes")
      === out.getAs[Array[Byte]]("payload").length.toLong)
  }

  test("parseMediaHeaders is columnar: no RDD scan seam in the plan") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    val qe = Multimodal.parseMediaHeaders(df, "id", "payload").queryExecution
    // the analyzed plan runs through the native expression...
    assert(qe.analyzed.toString.contains("graft_media_header"),
      qe.analyzed.toString)
    // ...and the physical plan has no RDD seam. (On this literal
    // fixture the optimizer constant-folds the expression into a
    // LocalTableScan — itself proof the expression lives inside
    // Catalyst rather than behind an opaque mapPartitions.)
    assert(!qe.executedPlan.toString.contains("ExistingRDD"),
      qe.executedPlan.toString)
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
