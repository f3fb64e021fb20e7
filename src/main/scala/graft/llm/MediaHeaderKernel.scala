package graft.llm

/** Pure byte-level container-header parsing — the codec-free real part
  * of multimodal metadata extraction. Every format's dimensions and
  * audio parameters live in fixed or scannable header positions:
  *
  *  - PNG: 8-byte signature, then the IHDR chunk — width/height are
  *    big-endian u32 at offsets 16/20 (PNG spec, RFC 2083 §4.1.1).
  *  - GIF: "GIF87a"/"GIF89a", logical screen width/height little-endian
  *    u16 at offsets 6/8 (GIF89a spec §18).
  *  - BMP: "BM", BITMAPINFOHEADER width/height little-endian i32 at
  *    offsets 18/22 (height may be negative = top-down rows).
  *  - WAV: "RIFF" + "WAVE" + "fmt " chunk: channels u16 @22, sample
  *    rate u32 @24, bits/sample u16 @34 (RIFF/WAVE format).
  *  - AVI: "RIFF" + "AVI " + hdrl LIST's "avih" MainAVIHeader:
  *    dwWidth/dwHeight little-endian u32 at body offsets 32/36
  *    (RIFF/AVI format); frame DECODE is [[VideoKernel]]'s job.
  *  - JPEG: marker scan for SOF0/SOF1/SOF2 (baseline/extended/
  *    progressive): each marker is 0xFF <type> <u16 length>; SOF
  *    payload is [precision u8][height u16][width u16][channels u8]
  *    (ITU T.81 §B.2.2).
  *  - MP4/MOV (ISO BMFF, ISO 14496-12): `ftyp` brand probe, then a
  *    `moov` box walk — `mvhd` timescale+duration → duration_ms,
  *    the `vide`-handler trak's `tkhd` 16.16-fixed dims (sample-entry
  *    u16 dims as fallback), `stsd` sample-entry fourcc → codec,
  *    `stsz` sample_count → frame count; a `soun`-handler trak fills
  *    channels / sample rate / sample size. Boxes are
  *    [u32be size][fourcc]; size 1 = u64 largesize follows, size 0 =
  *    to end of enclosing box. Frame DECODE stays out of scope (the
  *    JDK ships no H.264/HEVC codec) — at 100 TB the container
  *    metadata is what routing/filtering needs before any decode.
  *
  * All fields are -1 when absent (the DataFrame layer maps -1 → null).
  * Truncated or unrecognized payloads parse as "unknown" — never throw:
  * one corrupt file must not fail a 100 TB ingest task.
  */
object MediaHeaderKernel {

  final case class Header(format: String, width: Int = -1, height: Int = -1,
      channels: Int = -1, sampleRate: Int = -1, bitsPerSample: Int = -1,
      durationMs: Long = -1L, frameCount: Int = -1, codec: String = null)

  private val Unknown = Header("unknown")

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16be(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u16le(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  private def u32be(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def u32le(b: Array[Byte], i: Int): Long =
    (u8(b, i + 3).toLong << 24) | (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)
  private def i32le(b: Array[Byte], i: Int): Int = u32le(b, i).toInt
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    if (i + n > b.length) "" else new String(b, i, n, "US-ASCII")

  /** Clamp a u32 dimension into Int range; bogus values → -1. */
  private def dim(v: Long): Int =
    if (v > 0 && v <= Int.MaxValue) v.toInt else -1

  def parse(bytes: Array[Byte]): Header = {
    if (bytes == null || bytes.length < 10) return Unknown
    try {
      if (u8(bytes, 0) == 0x89 && ascii(bytes, 1, 3) == "PNG") parsePng(bytes)
      else if (ascii(bytes, 0, 4) == "GIF8") parseGif(bytes)
      else if (ascii(bytes, 0, 2) == "BM") parseBmp(bytes)
      else if (ascii(bytes, 0, 4) == "RIFF" && ascii(bytes, 8, 4) == "WAVE")
        parseWav(bytes)
      else if (ascii(bytes, 0, 4) == "RIFF" && ascii(bytes, 8, 4) == "AVI ")
        parseAvi(bytes)
      else if (u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8) parseJpeg(bytes)
      else if (bytes.length >= 12 && ascii(bytes, 4, 4) == "ftyp")
        parseMp4(bytes)
      else Unknown
    } catch { case _: Exception => Unknown }
  }

  private def parsePng(b: Array[Byte]): Header =
    if (b.length < 24 || ascii(b, 12, 4) != "IHDR") Header("png")
    else Header("png", dim(u32be(b, 16)), dim(u32be(b, 20)),
      // IHDR color type @25: 0 gray, 2 rgb, 3 palette, 4 gray+a, 6 rgba
      channels = if (b.length > 25) u8(b, 25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => -1
      } else -1)

  private def parseGif(b: Array[Byte]): Header =
    if (b.length < 10) Header("gif")
    else Header("gif", dim(u16le(b, 6)), dim(u16le(b, 8)))

  private def parseBmp(b: Array[Byte]): Header =
    if (b.length < 26) Header("bmp")
    // negative height = top-down bitmap; magnitude is the pixel height
    else Header("bmp", dim(i32le(b, 18)), dim(math.abs(i32le(b, 22))))

  private def parseWav(b: Array[Byte]): Header = {
    // walk RIFF chunks to find "fmt " (it is usually but not always
    // the first chunk after WAVE)
    var off = 12
    while (off + 8 <= b.length) {
      val id = ascii(b, off, 4)
      val sz = u32le(b, off + 4)
      if (id == "fmt " && off + 24 <= b.length)
        return Header("wav",
          channels = u16le(b, off + 10),
          sampleRate = dim(u32le(b, off + 12)),
          bitsPerSample = if (off + 24 <= b.length) u16le(b, off + 22) else -1)
      // bound-check the UNSIGNED size as a Long BEFORE advancing: a
      // crafted size like 0xFFFFFFF8 truncates to a negative Int whose
      // word-aligned advance is ZERO — an infinite loop, which the
      // try/catch cannot trap (one corrupt file must not wedge a task).
      // sz == 0 is a LEGAL empty chunk (JUNK padding) — advance past
      // its 8-byte header (progress is guaranteed), don't bail.
      if (off + 8 + sz + (sz & 1) > b.length) return Header("wav")
      off += 8 + sz.toInt + (sz.toInt & 1)
    }
    Header("wav")
  }

  private def parseAvi(b: Array[Byte]): Header = {
    // walk top-level chunks to the hdrl LIST; its first chunk is the
    // MainAVIHeader "avih" (dwWidth/dwHeight at body offsets 32/36).
    // Same unsigned-size guard as parseWav: a crafted size must not
    // wrap to a zero advance.
    var off = 12
    while (off + 12 <= b.length) {
      val id = ascii(b, off, 4)
      val sz = u32le(b, off + 4)
      // zero-size JUNK chunks before hdrl are legal RIFF — advance
      // past the 8-byte header instead of bailing (VideoKernel.walk
      // already agreed; the two walkers must not disagree)
      if (off + 8 + sz + (sz & 1) > b.length) return Header("avi")
      if (id == "LIST" && ascii(b, off + 8, 4) == "hdrl") {
        val c = off + 12
        return if (ascii(b, c, 4) == "avih" && c + 48 <= b.length)
          Header("avi", dim(u32le(b, c + 40)), dim(u32le(b, c + 44)))
        else Header("avi")
      }
      off += 8 + sz.toInt + (sz.toInt & 1)
    }
    Header("avi")
  }

  /** ISO-BMFF child boxes of [start, end): (fourcc, bodyStart,
    * bodyEnd). Every advance is validated against the enclosing bounds
    * BEFORE use — a crafted size (0 where illegal, < 8, past-end,
    * largesize overflow) terminates the walk instead of wedging or
    * throwing. */
  private def mp4Boxes(b: Array[Byte], start: Int, end: Int)
      : List[(String, Int, Int)] = {
    val out = List.newBuilder[(String, Int, Int)]
    var off = start
    var done = false
    while (!done && off + 8 <= end) {
      val sz = u32be(b, off)
      val typ = ascii(b, off + 4, 4)
      var hdr = 8
      var boxEnd: Long = off.toLong + sz
      if (sz == 0) boxEnd = end // box extends to end of enclosing box
      else if (sz == 1) { // u64 largesize follows the fourcc
        if (off + 16 > end) { done = true; boxEnd = -1 }
        else {
          hdr = 16
          val hi = u32be(b, off + 8)
          // >2 GiB cannot fit the Array anyway — treat as to-end
          boxEnd = if (hi != 0) end.toLong else off.toLong + u32be(b, off + 12)
        }
      } else if (sz < 8) { done = true; boxEnd = -1 } // corrupt
      if (!done) {
        if (boxEnd > end || boxEnd < off + hdr) done = true
        else {
          // boxEnd >= off + hdr >= off + 8 here, so progress is
          // guaranteed by the bounds check above
          out += ((typ, off + hdr, boxEnd.toInt))
          off = boxEnd.toInt
        }
      }
    }
    out.result()
  }

  private def parseMp4(b: Array[Byte]): Header = {
    val top = mp4Boxes(b, 0, b.length)
    // major brand distinguishes QuickTime .mov from .mp4 proper
    val fmt = top.find(_._1 == "ftyp") match {
      case Some((_, s, e)) if s + 4 <= e && ascii(b, s, 2) == "qt" => "mov"
      case _ => "mp4"
    }
    val moov = top.find(_._1 == "moov") match {
      case Some(m) => m
      case None => return Header(fmt)
    }
    val mBoxes = mp4Boxes(b, moov._2, moov._3)
    var durationMs = -1L
    mBoxes.find(_._1 == "mvhd").foreach { case (_, s, e) =>
      if (s < e) u8(b, s) match { // version
        case 1 if s + 32 <= e =>
          val ts = u32be(b, s + 20)
          val dur = (u32be(b, s + 24) << 32) | u32be(b, s + 28)
          // dur < 0 covers the 64-bit all-ones unknown sentinel; the
          // multiply bound keeps dur*1000 from wrapping to garbage
          if (ts > 0 && dur >= 0 && dur <= Long.MaxValue / 1000)
            durationMs = dur * 1000 / ts
        case 0 if s + 20 <= e =>
          val ts = u32be(b, s + 12)
          val dur = u32be(b, s + 16)
          // 0xFFFFFFFF is "duration unknown" (ISO 14496-12 §8.2.2.3)
          // — common in fragmented-MP4/DASH init segments
          if (ts > 0 && dur != 0xFFFFFFFFL) durationMs = dur * 1000 / ts
        case _ =>
      }
    }
    var w = -1; var h = -1; var frames = -1
    var videoCodec: String = null; var audioCodec: String = null
    var channels = -1; var rate = -1; var bits = -1
    mBoxes.iterator.filter(_._1 == "trak").foreach { case (_, ts0, te0) =>
      val tb = mp4Boxes(b, ts0, te0)
      val mdia = tb.find(_._1 == "mdia")
      val handler = mdia.map { case (_, s, e) =>
        mp4Boxes(b, s, e).find(_._1 == "hdlr") match {
          case Some((_, hs, he)) if hs + 12 <= he => ascii(b, hs + 8, 4)
          case _ => ""
        }
      }.getOrElse("")
      val stbl = mdia
        .flatMap { case (_, s, e) => mp4Boxes(b, s, e).find(_._1 == "minf") }
        .flatMap { case (_, s, e) => mp4Boxes(b, s, e).find(_._1 == "stbl") }
      // first stsd sample entry: [size][fourcc][6 reserved][u16 dataref]
      val entry = stbl
        .flatMap { case (_, s, e) => mp4Boxes(b, s, e).find(_._1 == "stsd") }
        .collect { case (_, s, e) if s + 16 <= e => (s + 8, e) }
      if (handler == "vide") {
        tb.find(_._1 == "tkhd").foreach { case (_, s, e) =>
          val wOff = s + (if (s < e && u8(b, s) == 1) 88 else 76)
          if (wOff + 8 <= e) { // 16.16 fixed-point dims
            val tw = (u32be(b, wOff) >> 16).toInt
            val th = (u32be(b, wOff + 4) >> 16).toInt
            if (tw > 0) w = tw
            if (th > 0) h = th
          }
        }
        entry.foreach { case (es, ee) =>
          videoCodec = ascii(b, es + 4, 4)
          // VisualSampleEntry u16 dims — fallback when tkhd is absent
          if (w < 0 && es + 36 <= ee) {
            w = dim(u16be(b, es + 32)); h = dim(u16be(b, es + 34))
          }
        }
        stbl.flatMap { case (_, s, e) =>
          mp4Boxes(b, s, e).find(_._1 == "stsz")
        }.foreach { case (_, s, e) =>
          if (s + 12 <= e) frames = dim(u32be(b, s + 8))
        }
      } else if (handler == "soun") {
        entry.foreach { case (es, ee) =>
          audioCodec = ascii(b, es + 4, 4)
          // AudioSampleEntry: channelcount/samplesize u16 at +24/+26,
          // samplerate 16.16 (integer part u16) at +32
          if (es + 36 <= ee) {
            channels = u16be(b, es + 24)
            bits = u16be(b, es + 26)
            rate = u16be(b, es + 32)
          }
        }
      }
    }
    Header(fmt, width = w, height = h, channels = channels,
      sampleRate = if (rate > 0) rate else -1,
      bitsPerSample = if (bits > 0) bits else -1,
      durationMs = durationMs, frameCount = frames,
      codec = if (videoCodec != null) videoCodec else audioCodec)
  }

  private def parseJpeg(b: Array[Byte]): Header = {
    var off = 2
    while (off + 4 <= b.length) {
      if (u8(b, off) != 0xff) return Header("jpeg") // lost marker sync
      val marker = u8(b, off + 1)
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) off += 2
      else {
        val len = u16be(b, off + 2)
        if (len < 2) return Header("jpeg")
        // SOF0 (baseline) / SOF1 (extended) / SOF2 (progressive)
        if ((marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
            && off + 9 < b.length)
          return Header("jpeg",
            width = dim(u16be(b, off + 7)),
            height = dim(u16be(b, off + 5)),
            channels = u8(b, off + 9))
        off += 2 + len
      }
    }
    Header("jpeg")
  }
}
