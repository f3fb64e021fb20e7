package graft.llm

import org.scalatest.funsuite.AnyFunSuite

class WarcKernelSpec extends AnyFunSuite {

  private val crlf = "\r\n"

  private def response(uri: String, status: String, ct: String,
      body: String): String = {
    val block = s"HTTP/1.1 $status$crlf" + s"Content-Type: $ct$crlf$crlf" + body
    s"WARC/1.0${crlf}WARC-Type: response${crlf}WARC-Target-URI: $uri$crlf" +
      s"WARC-Date: 2024-06-01T12:00:00Z$crlf" +
      s"Content-Type: application/http; msgtype=response$crlf" +
      s"Content-Length: ${block.length}$crlf$crlf" + block + crlf + crlf
  }

  private def metadata(uri: String, body: String): String =
    s"WARC/1.0${crlf}WARC-Type: metadata${crlf}WARC-Target-URI: $uri$crlf" +
      s"Content-Type: application/warc-fields$crlf" +
      s"Content-Length: ${body.length}$crlf$crlf" + body + crlf + crlf

  test("two records decompose: http response + raw metadata block") {
    val bytes = (response("http://a/1", "200 OK", "text/html", "<b>hi</b>") +
      metadata("http://a/1", "k: v")).getBytes("ISO-8859-1")
    val rs = WarcKernel.parse(bytes)
    assert(rs.length === 2)
    val r0 = rs(0)
    assert(r0.recType === "response")
    assert(r0.targetUri === "http://a/1")
    assert(r0.date === "2024-06-01T12:00:00Z")
    assert(r0.httpStatus === 200)
    assert(r0.httpContentType === "text/html")
    assert(new String(r0.body, "ISO-8859-1") === "<b>hi</b>")
    assert(r0.contentLength ===
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<b>hi</b>").length)
    val r1 = rs(1)
    assert(r1.recType === "metadata")
    assert(r1.httpStatus === -1)
    assert(r1.httpContentType === null)
    assert(new String(r1.body, "ISO-8859-1") === "k: v")
  }

  test("non-200 status and empty body parse") {
    val rs = WarcKernel.parse(
      response("http://a/2", "404 Not Found", "text/plain", "")
        .getBytes("ISO-8859-1"))
    assert(rs.length === 1)
    assert(rs.head.httpStatus === 404)
    assert(rs.head.body.length === 0)
  }

  test("gzip: concatenated members (the .warc.gz per-record convention)") {
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("ISO-8859-1")); g.close()
      bo.toByteArray
    }
    val bytes = gz(response("http://g/1", "200 OK", "text/html", "one")) ++
      gz(metadata("http://g/2", "two"))
    val rs = WarcKernel.parse(bytes)
    assert(rs.map(_.targetUri) === Seq("http://g/1", "http://g/2"))
    assert(new String(rs(1).body, "ISO-8859-1") === "two")
  }

  test("truncated mid-body: complete records survive, damage drops") {
    val full = (response("http://t/1", "200 OK", "text/html", "complete") +
      response("http://t/2", "200 OK", "text/html", "cut-off-body"))
      .getBytes("ISO-8859-1")
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 10)
    val rs = WarcKernel.parse(cut)
    assert(rs.length === 1)
    assert(rs.head.targetUri === "http://t/1")
  }

  test("truncated gzip member: the complete leading members survive") {
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("ISO-8859-1")); g.close()
      bo.toByteArray
    }
    val whole = gz(response("http://z/1", "200 OK", "text/html", "keep me")) ++
      gz(metadata("http://z/2", "to be damaged"))
    // cut inside the SECOND member: the first member's record must
    // survive the mid-stream EOFException (fail-open contract)
    val cut = java.util.Arrays.copyOfRange(whole, 0, whole.length - 6)
    val rs = WarcKernel.parse(cut)
    assert(rs.nonEmpty && rs.head.targetUri === "http://z/1")
    assert(new String(rs.head.body, "ISO-8859-1") === "keep me")
  }

  test("request records decompose too: headers stripped, no status") {
    val body = "q=spark"
    val block = s"POST /search HTTP/1.1${crlf}Content-Type: " +
      s"application/x-www-form-urlencoded$crlf$crlf" + body
    val rec = s"WARC/1.0${crlf}WARC-Type: request$crlf" +
      s"WARC-Target-URI: http://r/1$crlf" +
      s"Content-Type: application/http; msgtype=request$crlf" +
      s"Content-Length: ${block.length}$crlf$crlf" + block + crlf + crlf
    val rs = WarcKernel.parse(rec.getBytes("ISO-8859-1"))
    assert(rs.length === 1)
    assert(rs.head.recType === "request")
    assert(rs.head.httpStatus === -1) // requests have no status
    assert(rs.head.httpContentType === "application/x-www-form-urlencoded")
    assert(new String(rs.head.body, "ISO-8859-1") === body)
  }

  test("garbage, null, and missing Content-Length yield no records") {
    assert(WarcKernel.parse("not a warc at all".getBytes) === Nil)
    assert(WarcKernel.parse(null) === Nil)
    assert(WarcKernel.parse(Array[Byte](0x1f, 0x8b.toByte, 0, 0)) === Nil)
    val noLen = (s"WARC/1.0${crlf}WARC-Type: metadata$crlf$crlf" + "body")
      .getBytes("ISO-8859-1")
    assert(WarcKernel.parse(noLen) === Nil)
  }

  test("LF-only framing parses like CRLF") {
    val body = "plain"
    val rec = s"WARC/1.0\nWARC-Type: resource\nWARC-Target-URI: http://l/1\n" +
      s"Content-Type: text/plain\nContent-Length: ${body.length}\n\n" +
      body + "\n\n"
    val rs = WarcKernel.parse(rec.getBytes("ISO-8859-1"))
    assert(rs.length === 1)
    assert(rs.head.recType === "resource")
    assert(rs.head.httpStatus === -1) // not application/http
    assert(new String(rs.head.body, "ISO-8859-1") === body)
  }
}
