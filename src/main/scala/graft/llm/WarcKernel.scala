package graft.llm

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

/** Pure byte-level WARC (ISO 28500) record walker — the ingestion
  * format of web-scale training corpora (Common Crawl ships ~100 TB
  * per snapshot as `.warc.gz`). No external deps: record framing is a
  * plain header/CRLF walk; gzip members decompress through the JDK
  * (`GZIPInputStream` handles the member-per-record concatenation
  * convention transparently).
  *
  * Robustness contract matches [[MediaHeaderKernel]]: corrupt or
  * truncated input never throws — the walker returns the records
  * parsed before the damage (possibly none). A decompressed-size cap
  * guards against gzip bombs: past the cap the stream is cut and the
  * already-complete records are returned (the fail-open direction is
  * deliberate — one pathological file must not fail a 100 TB ingest
  * task; the caller sees fewer records, never a crash).
  *
  * Reference scope note: the reference pipeline ingests JSONL/CSV
  * only (file_readers, flask_data_pipes/extract.py) — WARC is
  * brief-scope [EXT] surface for the multimodal/web-corpus tier.
  */
object WarcKernel {

  /** One parsed record. `httpStatus`/`httpContentType`/`body` are the
    * HTTP-decomposed view when the record's Content-Type is
    * `application/http` (the `response`/`request` payload convention);
    * otherwise httpStatus = -1, httpContentType = null and `body` is
    * the raw content block. */
  final case class Record(
      recType: String,
      targetUri: String,
      date: String,
      contentType: String,
      contentLength: Long,
      httpStatus: Int,
      httpContentType: String,
      body: Array[Byte])

  /** Decompressed-size cap (bytes) for gzipped input. */
  val MaxInflated: Int = 512 * 1024 * 1024

  def parse(bytes: Array[Byte]): Seq[Record] = {
    if (bytes == null || bytes.length < 4) return Nil
    val buf =
      if ((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) inflate(bytes)
      else bytes
    if (buf == null) return Nil
    walk(buf)
  }

  /** All gzip members, capped at [[MaxInflated]]. A mid-stream gzip
    * error (truncated member — the motivating one-bad-file case, and
    * `.gz` IS the format Common Crawl ships) keeps everything
    * decompressed so far: the complete leading members' records must
    * survive per the fail-open contract, not vanish with the damaged
    * tail. */
  private def inflate(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(
      math.min(bytes.length, 16 * 1024 * 1024) * 4)
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
      val chunk = new Array[Byte](64 * 1024)
      var n = in.read(chunk)
      while (n >= 0 && out.size() <= MaxInflated - n) {
        out.write(chunk, 0, n)
        n = in.read(chunk)
      }
    } catch { case _: java.io.IOException => () }
    out.toByteArray
  }

  private def walk(buf: Array[Byte]): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    var off = 0
    var ok = true
    while (ok && off < buf.length) {
      // skip inter-record CRLFs
      while (off < buf.length && (buf(off) == '\r' || buf(off) == '\n')) off += 1
      if (off >= buf.length) ok = false
      else {
        val versionEnd = lineEnd(buf, off)
        if (versionEnd < 0 || !startsWith(buf, off, "WARC/")) ok = false
        else {
          val (headers, bodyOff) = readHeaders(buf, nextLine(buf, versionEnd))
          val len = headers.getOrElse("content-length", "-1") match {
            case s => try s.trim.toLong catch { case _: NumberFormatException => -1L }
          }
          if (bodyOff < 0 || len < 0 || bodyOff + len > buf.length) ok = false
          else {
            val block = java.util.Arrays.copyOfRange(buf, bodyOff,
              bodyOff + len.toInt)
            val cType = headers.getOrElse("content-type", null)
            val rec =
              if (cType != null &&
                  cType.toLowerCase(java.util.Locale.ROOT)
                    .startsWith("application/http"))
                httpDecompose(headers, cType, len, block)
              else Record(headers.getOrElse("warc-type", null),
                headers.getOrElse("warc-target-uri", null),
                headers.getOrElse("warc-date", null), cType, len, -1, null, block)
            out += rec
            off = bodyOff + len.toInt
          }
        }
      }
    }
    out.result()
  }

  private def httpDecompose(headers: Map[String, String], cType: String,
      len: Long, block: Array[Byte]): Record = {
    var status = -1
    var httpCt: String = null
    var body = block
    val statusEnd = lineEnd(block, 0)
    if (statusEnd > 0) {
      val line = new String(block, 0, statusEnd, "ISO-8859-1")
      val parts = line.split(" ", 3)
      val isStatusLine = startsWith(block, 0, "HTTP/")
      // a request record's first line is "<METHOD> <target> HTTP/x.y"
      // — decompose it too (headers stripped from body, Content-Type
      // surfaced), with status staying the no-status sentinel
      val isRequestLine = !isStatusLine && parts.length == 3 &&
        parts(2).startsWith("HTTP/")
      if (isStatusLine || isRequestLine) {
        if (isStatusLine && parts.length >= 2)
          try status = parts(1).toInt catch { case _: NumberFormatException => }
        val (httpHeaders, bodyOff) =
          readHeaders(block, nextLine(block, statusEnd))
        if (bodyOff >= 0) {
          httpCt = httpHeaders.getOrElse("content-type", null)
          body = java.util.Arrays.copyOfRange(block, bodyOff, block.length)
        }
      }
    }
    Record(headers.getOrElse("warc-type", null),
      headers.getOrElse("warc-target-uri", null),
      headers.getOrElse("warc-date", null), cType, len, status, httpCt, body)
  }

  /** Header lines from `off` until the blank line; returns
    * (lowercased-name map, offset just past the blank line), or
    * (headers, -1) if the blank line never arrives (truncated). */
  private def readHeaders(buf: Array[Byte],
      start: Int): (Map[String, String], Int) = {
    val m = Map.newBuilder[String, String]
    var off = start
    while (off >= 0 && off < buf.length) {
      val end = lineEnd(buf, off)
      if (end < 0) return (m.result(), -1)
      if (end == off) return (m.result(), nextLine(buf, end)) // blank line
      val line = new String(buf, off, end - off, "ISO-8859-1")
      val colon = line.indexOf(':')
      if (colon > 0)
        m += line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT) -> line.substring(colon + 1).trim
      off = nextLine(buf, end)
    }
    (m.result(), -1)
  }

  /** Offset of the terminating CR/LF of the line starting at `off`
    * (i.e. the line's exclusive end), or -1 if no terminator before
    * EOF. */
  private def lineEnd(buf: Array[Byte], off: Int): Int = {
    var i = off
    while (i < buf.length && buf(i) != '\n') i += 1
    if (i >= buf.length) -1
    else if (i > off && buf(i - 1) == '\r') i - 1
    else i
  }

  /** Offset just past the line terminator at `end`. */
  private def nextLine(buf: Array[Byte], end: Int): Int =
    if (end < 0) -1
    else if (end < buf.length && buf(end) == '\r') end + 2
    else end + 1

  private def startsWith(buf: Array[Byte], off: Int, s: String): Boolean = {
    if (off + s.length > buf.length) return false
    var i = 0
    while (i < s.length) {
      if (buf(off + i) != s.charAt(i)) return false
      i += 1
    }
    true
  }
}
