package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the WARC grammar: exact offsets on a handcrafted two-record
  * file, the HTTP split and its degradation paths, version tolerance,
  * and every whole-buffer reject (the corpus-facing oracles cover the
  * happy path at scale; this suite holds the malformed corners).
  */
class WebArchiveSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private val html = "<p>hi</p>"
  private val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html"
  private val rec0 =
    "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
  private val rec1 =
    s"WARC/1.1\r\nWARC-Type: response\r\nWARC-Target-URI: http://a.com/x\r\n" +
      s"X-Extra: ignored\r\nContent-Length: ${http.length}\r\n\r\n$http\r\n\r\n"
  private val file = rec0 + rec1

  test("two-record file: exact offsets, HTTP split, 1.0+1.1 versions") {
    val recs = WebArchive.warcRecords(b(file)).get
    assert(recs.length == 2)
    val r0 = recs(0)
    assert(r0 == WebArchive.WarcRec(0, "warcinfo", "", 4, -1,
      0, rec0.length - 4 - 4, 4))
    val r1 = recs(1)
    assert(r1.idx == 1 && r1.warcType == "response" &&
      r1.targetUri == "http://a.com/x" && r1.httpStatus == 200)
    assert(r1.headerOffset == rec0.length)
    assert(r1.contentLength == http.length)
    assert(r1.bodyOffset == file.length - 4 - html.length)
    assert(r1.bodyLength == html.length)
    assert(WebArchive.bodyString(b(file), r1) == html)
    assert(WebArchive.bodyString(b(file), r0) == "info")
  }

  test("last record may end at exact EOF (stream-cut file, no trailing separator)") {
    val cut = rec0 + rec1.dropRight(4)
    val recs = WebArchive.warcRecords(b(cut)).get
    assert(recs.length == 2 && recs(1).httpStatus == 200)
  }

  test("non-HTTP response block degrades to whole-block body, status -1") {
    val r = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    val recs = WebArchive.warcRecords(b(r)).get
    assert(recs.head.httpStatus == -1 && recs.head.bodyLength == 5)
  }

  test("HTTP block without a header terminator degrades to whole block") {
    val payload = "HTTP/1.1 200 OK\r\nX: no terminator"
    val r = s"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n"
    val recs = WebArchive.warcRecords(b(r)).get
    assert(recs.head.httpStatus == -1 && recs.head.bodyLength == payload.length)
  }

  test("rejects: wrong magic, bad version, truncated block, missing separator, bad lengths") {
    assert(WebArchive.warcRecords(b("")).isEmpty)
    assert(WebArchive.warcRecords(b("GIF89a whatever")).isEmpty)
    assert(WebArchive.warcRecords(b("WARC/2.0\r\nWARC-Type: x\r\nContent-Length: 0\r\n\r\n")).isEmpty)
    // truncated block (Content-Length beyond EOF)
    assert(WebArchive.warcRecords(b("WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 99\r\n\r\nshort")).isEmpty)
    // missing mandatory headers
    assert(WebArchive.warcRecords(b("WARC/1.0\r\nContent-Length: 0\r\n\r\n")).isEmpty)
    assert(WebArchive.warcRecords(b("WARC/1.0\r\nWARC-Type: x\r\n\r\n")).isEmpty)
    // non-numeric / oversized Content-Length
    assert(WebArchive.warcRecords(b("WARC/1.0\r\nWARC-Type: x\r\nContent-Length: ten\r\n\r\n")).isEmpty)
    assert(WebArchive.warcRecords(
      b("WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 9999999999999999999\r\n\r\n")).isEmpty)
    // header line with no colon
    assert(WebArchive.warcRecords(b("WARC/1.0\r\nnocolonhere\r\n\r\n")).isEmpty)
    // record separator missing between records
    assert(WebArchive.warcRecords(b(
      "WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 1\r\n\r\nZ" + rec0)).isEmpty)
    // garbage after a valid record's separator
    assert(WebArchive.warcRecords(b(rec0 + "junk")).isEmpty)
  }

  test("maxRecords bounds adversarial many-record files") {
    val tiny = "WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    val many = tiny * 10
    assert(WebArchive.warcRecords(b(many)).get.length == 10)
    assert(WebArchive.warcRecords(b(many), maxRecords = 9).isEmpty)
  }
}
