package graft.llm

/** Pure byte-level RIFF/AVI frame extraction — the codec-free REAL
  * part of video frame sampling. Uncompressed AVI (fourcc `DIB `,
  * BITMAPINFOHEADER `biCompression = BI_RGB`, 24 bpp) stores each
  * frame as a raw bottom-up BGR bitmap inside a `00db` movi chunk —
  * plain bytes, decodable with zero codec libraries, exactly like the
  * BMP path in [[MediaHeaderKernel]]. Compressed codecs (H.264, VP9,
  * MJPEG …) remain genuinely out of scope for the no-external-deps
  * build; the CONTAINER walk below (chunk offsets, frame indexing,
  * sampling) is codec-independent and is the part a real codec would
  * plug into.
  *
  * AVI layout (Microsoft RIFF/AVI spec):
  * {{{
  * RIFF <sz> "AVI "
  *   LIST <sz> "hdrl"
  *     "avih" <56> MainAVIHeader (dwTotalFrames @16, dwWidth @32, dwHeight @36)
  *     LIST <sz> "strl"
  *       "strh" <56> (fccType "vids", fccHandler "DIB ")
  *       "strf" <40> BITMAPINFOHEADER (biWidth @4, biHeight @8,
  *                   biBitCount @14 = 24, biCompression @16 = 0)
  *   LIST <sz> "movi"
  *     "00db" <sz> raw BGR rows, bottom-up, 4-byte-aligned   × frames
  * }}}
  * Chunks are even-padded; sizes are validated as UNSIGNED before any
  * offset advance (a crafted size must not wrap negative). Truncated,
  * non-AVI, or compressed payloads return null — one corrupt file
  * must never fail a 100 TB task.
  */
object VideoKernel {

  /** Decoded sampling result: stream dims + one 16-bin BT.601
    * luminance histogram (normalized to sum 1) per SAMPLED frame,
    * keyed by the frame's index in the stream. */
  final case class Sampled(width: Int, height: Int, totalFrames: Int,
      frames: Array[(Int, Array[Float])])

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16le(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  private def u32le(b: Array[Byte], i: Int): Long =
    (u8(b, i + 3).toLong << 24) | (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)
  private def i32le(b: Array[Byte], i: Int): Int = u32le(b, i).toInt
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    if (i + n > b.length) "" else new String(b, i, n, "US-ASCII")

  /** Walk the chunks of a RIFF region `[from, until)`, invoking `f`
    * with (fourcc, listSubtype-or-null, bodyStart, bodySize). Bounds
    * are checked with Long arithmetic so oversized u32 sizes cannot
    * wrap an Int offset. */
  private def walk(b: Array[Byte], from: Int, until: Int)(
      f: (String, String, Int, Int) => Unit): Unit = {
    var i = from
    while (i + 8 <= until) {
      val id = ascii(b, i, 4)
      val sz = u32le(b, i + 4)
      if (sz < 0 || i + 8L + sz > until) return // truncated/crafted
      if (id == "LIST" && sz >= 4)
        f("LIST", ascii(b, i + 8, 4), i + 12, sz.toInt - 4)
      else f(id, null, i + 8, sz.toInt)
      i += (8L + sz + (sz & 1L)).toInt
    }
  }

  /** Parsed uncompressed-AVI stream: dims + (offset, size) of every
    * `00db` frame chunk, pre-validated (24 bpp BI_RGB, no truncated
    * frame). Shared by the histogram and dHash extractors. */
  private final case class Parsed(w: Int, h: Int,
      frameChunks: IndexedSeq[(Int, Int)], rowBytes: Int)

  private def parseUncompressed(bytes: Array[Byte]): Parsed = {
    if (bytes == null || bytes.length < 12) return null
    if (ascii(bytes, 0, 4) != "RIFF" || ascii(bytes, 8, 4) != "AVI ") return null
    var w = -1; var h = -1; var ok = false
    val frameChunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    walk(bytes, 12, bytes.length) {
      case ("LIST", "hdrl", s, n) =>
        walk(bytes, s, s + n) {
          case ("LIST", "strl", s2, n2) =>
            walk(bytes, s2, s2 + n2) {
              case ("strf", _, s3, n3) if n3 >= 20 && w < 0 =>
                // first video stream's BITMAPINFOHEADER
                w = i32le(bytes, s3 + 4)
                h = math.abs(i32le(bytes, s3 + 8))
                ok = u16le(bytes, s3 + 14) == 24 && u32le(bytes, s3 + 16) == 0L
              case _ => ()
            }
          case _ => ()
        }
      case ("LIST", "movi", s, n) =>
        walk(bytes, s, s + n) {
          case (id, _, s2, n2)
              if id.length == 4 && id.endsWith("db") => frameChunks += ((s2, n2))
          case _ => ()
        }
      case _ => ()
    }
    if (!ok || w <= 0 || h <= 0 || frameChunks.isEmpty) return null
    val rowBytes = ((w * 3 + 3) / 4) * 4
    if (frameChunks.exists(_._2 < rowBytes * h)) return null // truncated frame
    Parsed(w, h, frameChunks.toIndexedSeq, rowBytes)
  }

  /** Extract every `every`-th frame (0, every, 2·every, …) of an
    * uncompressed 24-bpp AVI as a 16-bin luminance histogram. Returns
    * null for anything that is not a complete uncompressed AVI. */
  def sampleFrames(bytes: Array[Byte], every: Int): Sampled = {
    if (every < 1) return null
    try {
      val p = parseUncompressed(bytes)
      if (p == null) return null
      val Parsed(w, h, frameChunks, rowBytes) = p
      val sampled = frameChunks.indices.by(every).map { fi =>
        val (off, _) = frameChunks(fi)
        val hist = new Array[Float](16)
        var y = 0
        while (y < h) {
          val rs = off + y * rowBytes
          var x = 0
          while (x < w) {
            val bl = u8(bytes, rs + 3 * x)
            val g = u8(bytes, rs + 3 * x + 1)
            val r = u8(bytes, rs + 3 * x + 2)
            hist((299 * r + 587 * g + 114 * bl) / 1000 / 16) += 1f
            x += 1
          }
          y += 1
        }
        val total = (w.toLong * h).toFloat
        var i = 0
        while (i < 16) { hist(i) /= total; i += 1 }
        (fi, hist)
      }.toArray
      Sampled(w, h, frameChunks.length, sampled)
    } catch { case _: Exception => null }
  }

  /** Per-frame dHash result: dims + (frame_idx, 64-bit hash) per
    * sampled frame. */
  final case class Hashed(width: Int, height: Int, totalFrames: Int,
      frames: Array[(Int, Long)])

  /** Per-frame perceptual dHash of every `every`-th frame — the same
    * 9×8 nearest-neighbor grid / integer milli-luma / horizontal
    * gradient definition as `Multimodal.imageDHash`, computed
    * directly on the raw DIB bytes (no ImageIO round-trip). Grid row
    * `sy` indexes STORAGE rows (first row of the frame buffer);
    * uncompressed DIB frames are bottom-up, so hashes are of the
    * vertically flipped image — consistent for every frame and both
    * engines, and near-dup comparisons only ever compare hashes
    * computed the same way. Returns null for anything that is not a
    * complete uncompressed AVI. */
  def frameDHashes(bytes: Array[Byte], every: Int): Hashed = {
    if (every < 1) return null
    try {
      val p = parseUncompressed(bytes)
      if (p == null) return null
      val Parsed(w, h, frameChunks, rowBytes) = p
      val hashed = frameChunks.indices.by(every).map { fi =>
        val (off, _) = frameChunks(fi)
        val lum = Array.ofDim[Int](8, 9)
        var row = 0
        while (row < 8) {
          val rs = off + (row * h / 8) * rowBytes
          var c = 0
          while (c < 9) {
            val px = rs + 3 * (c * w / 9)
            lum(row)(c) = 299 * u8(bytes, px + 2) + 587 * u8(bytes, px + 1) +
              114 * u8(bytes, px)
            c += 1
          }
          row += 1
        }
        var hash = 0L
        row = 0
        while (row < 8) {
          var c = 0
          while (c < 8) {
            if (lum(row)(c + 1) > lum(row)(c)) hash |= 1L << (row * 8 + c)
            c += 1
          }
          row += 1
        }
        (fi, hash)
      }.toArray
      Hashed(w, h, frameChunks.length, hashed)
    } catch { case _: Exception => null }
  }
}
