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

  // ---- gzip member walk (the .warc.gz layer) ----

  /** one gzip member via the INDEPENDENT JDK encoder. */
  private def gz(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(payload); g.close()
    bos.toByteArray
  }

  test("gunzip: single member round-trips against the JDK encoder") {
    assert(WebArchive.gunzip(gz(b(file))).get.sameElements(b(file)))
  }

  test("gunzip: multi-member concatenation (the record-per-member .warc.gz layout)") {
    val cat = gz(b(rec0)) ++ gz(b(rec1))
    assert(WebArchive.gunzip(cat).get.sameElements(b(file)))
    // and the full parse over it equals the plain parse
    assert(WebArchive.warcRecordsAny(cat).get._2 ==
      WebArchive.warcRecords(b(file)).get)
  }

  test("gunzip: optional header fields (FEXTRA/FNAME/FCOMMENT/FHCRC) are walked") {
    val plain = gz(b("payload"))
    // splice optional fields into the fixed header: FLG = FEXTRA|FNAME|FCOMMENT
    val deflateAndTrailer = plain.drop(10)
    val hdr = plain.take(10).clone()
    hdr(3) = (4 | 8 | 16).toByte
    val extra = Array[Byte](3, 0, 1, 2, 3) // xlen=3 LE + 3 bytes
    val name = "file.warc".getBytes("US-ASCII") :+ 0.toByte
    val comment = "c".getBytes("US-ASCII") :+ 0.toByte
    val spliced = hdr ++ extra ++ name ++ comment ++ deflateAndTrailer
    assert(WebArchive.gunzip(spliced).get.sameElements(b("payload")))
  }

  test("gunzip: FHCRC is verified — correct CRC16 accepted, corrupt rejected") {
    val plain = gz(b("payload"))
    val hdr = plain.take(10).clone()
    hdr(3) = 2.toByte // FHCRC only
    val crc = new java.util.zip.CRC32()
    crc.update(hdr, 0, 10)
    val c16 = (crc.getValue & 0xffffL).toInt
    val fhcrc = Array[Byte]((c16 & 0xff).toByte, ((c16 >> 8) & 0xff).toByte)
    val good = hdr ++ fhcrc ++ plain.drop(10)
    assert(WebArchive.gunzip(good).get.sameElements(b("payload")))
    val bad = good.clone(); bad(10) = (bad(10) ^ 1).toByte
    assert(WebArchive.gunzip(bad).isEmpty)
  }

  test("gunzip rejects: corrupt CRC, corrupt ISIZE, truncation, reserved flags, trailing garbage") {
    val ok = gz(b("payload"))
    val badCrc = ok.clone(); badCrc(ok.length - 8) = (badCrc(ok.length - 8) ^ 1).toByte
    assert(WebArchive.gunzip(badCrc).isEmpty)
    val badIsize = ok.clone(); badIsize(ok.length - 1) = (badIsize(ok.length - 1) ^ 1).toByte
    assert(WebArchive.gunzip(badIsize).isEmpty)
    assert(WebArchive.gunzip(ok.dropRight(3)).isEmpty)
    assert(WebArchive.gunzip(ok.take(8)).isEmpty)
    val badFlg = ok.clone(); badFlg(3) = 0x20.toByte
    assert(WebArchive.gunzip(badFlg).isEmpty)
    assert(WebArchive.gunzip(ok ++ b("junk")).isEmpty)
    assert(WebArchive.gunzip(b("not gzip")).isEmpty)
  }

  test("gunzip: decompression-bomb cap bails during inflation, not after") {
    val bomb = gz(new Array[Byte](4 << 20)) // 4 MiB of zeros, ~4 KiB compressed
    assert(WebArchive.gunzip(bomb, maxOut = 1 << 20).isEmpty)
    assert(WebArchive.gunzip(bomb, maxOut = 8 << 20).get.length == (4 << 20))
  }

  test("warcRecordsAny: gzipped archive parses identically to plain; offsets index the returned buffer") {
    val (raw, recs) = WebArchive.warcRecordsAny(gz(b(file))).get
    assert(recs == WebArchive.warcRecords(b(file)).get)
    assert(WebArchive.bodyString(raw, recs(1)) == html)
  }

  // ---- HTTP payload decoding (the real-archive wire shapes) ----

  private def chunked(payload: Array[Byte], size: Int = 5): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    payload.grouped(size).foreach { c =>
      bos.write(b(c.length.toHexString + "\r\n")); bos.write(c); bos.write(b("\r\n"))
    }
    bos.write(b("0\r\n\r\n"))
    bos.toByteArray
  }

  test("dechunk: multi-chunk reassembly, extensions and trailers tolerated, stream-cut ok") {
    val body = b("hello chunked world")
    val c = chunked(body)
    assert(WebArchive.dechunk(c, 0, c.length).get.sameElements(body))
    // chunk extension after ';' and a trailer section
    val ext = b("13;ext=v\r\n") ++ body ++ b("\r\n0\r\nX-Trailer: t\r\n\r\n")
    assert(WebArchive.dechunk(ext, 0, ext.length).get.sameElements(body))
    // stream-cut right after the last-chunk line
    val cut = b("13\r\n") ++ body ++ b("\r\n0\r\n")
    assert(WebArchive.dechunk(cut, 0, cut.length).get.sameElements(body))
    // offset/len slice a larger buffer
    val padded = b("XX") ++ c ++ b("YY")
    assert(WebArchive.dechunk(padded, 2, c.length).get.sameElements(body))
  }

  test("dechunk: zero-padded size lines are legal (RFC 9112 bounds no digit count)") {
    val body = b("hello")
    val padded = b("0000000005\r\n") ++ body ++ b("\r\n000\r\n\r\n")
    assert(WebArchive.dechunk(padded, 0, padded.length).get.sameElements(body))
    // the VALUE is still bounded: > 8 significant digits rejects
    val huge = b("100000000\r\nx\r\n0\r\n\r\n")
    assert(WebArchive.dechunk(huge, 0, huge.length).isEmpty)
  }

  test("dechunk rejects: bad hex, truncated chunk, missing CRLF, trailing garbage, bomb cap") {
    val body = b("hello")
    assert(WebArchive.dechunk(b("zz\r\nhello\r\n0\r\n\r\n"), 0, 16).isEmpty)
    assert(WebArchive.dechunk(b("\r\nhello\r\n0\r\n\r\n"), 0, 14).isEmpty) // empty size
    val c = b("5\r\n") ++ body ++ b("\r\n0\r\n\r\n")
    assert(WebArchive.dechunk(c, 0, c.length - 8).isEmpty) // cut mid-data
    val noCrlf = b("5\r\nhelloXX0\r\n\r\n")
    assert(WebArchive.dechunk(noCrlf, 0, noCrlf.length).isEmpty)
    val junk = c ++ b("junk")
    assert(WebArchive.dechunk(junk, 0, junk.length).isEmpty)
    assert(WebArchive.dechunk(c, 0, c.length, maxOut = 4).isEmpty)
    assert(WebArchive.dechunk(c, 0, c.length, maxOut = 5).get.sameElements(body))
  }

  test("inflate: zlib-wrapped and raw deflate both decode; corrupt rejects; cap binds") {
    val payload = b("deflate payload bytes")
    def deflate(nowrap: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
      d.setInput(payload); d.finish()
      val buf = new Array[Byte](256)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    assert(WebArchive.inflate(deflate(nowrap = false)).get.sameElements(payload))
    assert(WebArchive.inflate(deflate(nowrap = true)).get.sameElements(payload))
    assert(WebArchive.inflate(b("garbage not deflate at all")).isEmpty)
    assert(WebArchive.inflate(deflate(nowrap = false), maxOut = 4).isEmpty)
  }

  private def responseWarc(headers: String, bodyBytes: Array[Byte]): Array[Byte] = {
    val http = b(s"HTTP/1.1 200 OK\r\n$headers\r\n") ++ bodyBytes
    b(s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://a.com/x\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n") ++ http ++ b("\r\n\r\n")
  }

  test("decodeHttpBody: chunked, gzip, chunked-over-gzip, deflate — and the framing headers parse") {
    val page = b("<p>real archive body</p>")
    val gzPage = gz(page)
    val cases = Seq(
      ("", page, page),
      ("Transfer-Encoding: chunked\r\n", chunked(page, 7), page),
      ("Content-Encoding: gzip\r\n", gzPage, page),
      ("content-encoding: x-gzip\r\n", gzPage, page), // case-insensitive names, x- alias
      ("Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
        chunked(gzPage, 11), page)) // transfer coding undone FIRST
    for ((hdrs, wire, want) <- cases) {
      val buf = responseWarc(hdrs, wire)
      val rec = WebArchive.warcRecords(buf).get.head
      assert(WebArchive.decodeHttpBody(buf, rec).sameElements(want), hdrs)
    }
    val defl = {
      val d = new java.util.zip.Deflater(); d.setInput(page); d.finish()
      val tmp = new Array[Byte](256); val n = d.deflate(tmp); d.end()
      java.util.Arrays.copyOf(tmp, n)
    }
    val dbuf = responseWarc("Content-Encoding: deflate\r\n", defl)
    assert(WebArchive.decodeHttpBody(dbuf, WebArchive.warcRecords(dbuf).get.head)
      .sameElements(page))
  }

  test("decodeHttpBody degrades layer-by-layer on mislabeled or corrupt framing") {
    val page = b("<p>page</p>")
    // claims chunked but body is not chunked → raw body flows through
    val notChunked = responseWarc("Transfer-Encoding: chunked\r\n", page)
    assert(WebArchive.decodeHttpBody(notChunked, WebArchive.warcRecords(notChunked).get.head)
      .sameElements(page))
    // claims gzip but body is plain → raw body flows through
    val notGz = responseWarc("Content-Encoding: gzip\r\n", page)
    assert(WebArchive.decodeHttpBody(notGz, WebArchive.warcRecords(notGz).get.head)
      .sameElements(page))
    // chunked OK but inner gzip corrupt → de-chunked bytes flow through
    val badGz = gz(page).clone(); badGz(badGz.length - 1) = (badGz(badGz.length - 1) ^ 1).toByte
    val mixed = responseWarc("Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
      chunked(badGz, 9))
    assert(WebArchive.decodeHttpBody(mixed, WebArchive.warcRecords(mixed).get.head)
      .sameElements(badGz))
    // unknown content coding passes untouched
    val unk = responseWarc("Content-Encoding: br\r\n", page)
    assert(WebArchive.decodeHttpBody(unk, WebArchive.warcRecords(unk).get.head)
      .sameElements(page))
  }

  test("decodeHttpPayload: residual carries exactly the codings NOT undone") {
    val page = b("<p>page</p>")
    def payload(hdrs: String, wire: Array[Byte]): (Array[Byte], String) = {
      val buf = responseWarc(hdrs, wire)
      WebArchive.decodeHttpPayload(buf, WebArchive.warcRecords(buf).get.head)
    }
    // fully decoded → empty residual
    assert(payload("", page)._2 == "")
    assert(payload("Transfer-Encoding: chunked\r\n", chunked(page, 5))._2 == "")
    assert(payload("Content-Encoding: gzip\r\n", gz(page))._2 == "")
    // identity is a no-op, never a wrapper — absent from any residual
    assert(payload("Content-Encoding: identity\r\n", page) match {
      case (bts, res) => bts.sameElements(page) && res == ""
    })
    // undecodable / mislabeled → the still-wrapped codings, innermost-first
    assert(payload("Content-Encoding: br\r\n", page)._2 == "br")
    assert(payload("Transfer-Encoding: chunked\r\n", page)._2 == "chunked")
    assert(payload("Content-Encoding: gzip\r\n", page)._2 == "gzip")
    // chunked undone, inner gzip mislabeled → only 'gzip' remains
    assert(payload("Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
      chunked(page, 5))._2 == "gzip")
    // outermost fails → NOTHING inner is attempted (coded bytes are
    // opaque): the whole stack stays wrapped
    assert(payload("Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
      gz(page)) match {
      case (bts, res) => bts.sameElements(gz(page)) && res == "gzip, chunked"
    })
  }

  test("decodeHttpPayload: stacked transfer codings undo right-to-left (TE: gzip, chunked)") {
    val page = b("<p>stacked transfer codings</p>")
    val buf = responseWarc("Transfer-Encoding: gzip, chunked\r\n", chunked(gz(page), 9))
    val (bts, res) = WebArchive.decodeHttpPayload(buf, WebArchive.warcRecords(buf).get.head)
    assert(bts.sameElements(page) && res == "")
    // composes with a content coding below the transfer stack
    val buf2 = responseWarc("Transfer-Encoding: gzip, chunked\r\nContent-Encoding: deflate\r\n",
      chunked(gz({
        val d = new java.util.zip.Deflater(); d.setInput(page); d.finish()
        val tmp = new Array[Byte](256); val n = d.deflate(tmp); d.end()
        java.util.Arrays.copyOf(tmp, n)
      }), 9))
    val (bts2, res2) = WebArchive.decodeHttpPayload(buf2, WebArchive.warcRecords(buf2).get.head)
    assert(bts2.sameElements(page) && res2 == "")
  }

  test("decodeHttpPayload: parameterized coding tokens match after the ;parameter strips") {
    val page = b("<p>parameterized chunked</p>")
    // RFC 9112 §7 transfer-parameters: `chunked;ext=1` must still dechunk
    val buf = responseWarc("Transfer-Encoding: chunked;ext=1\r\n", chunked(page, 7))
    val (bts, res) = WebArchive.decodeHttpPayload(buf, WebArchive.warcRecords(buf).get.head)
    assert(bts.sameElements(page) && res == "")
    // parameterized member inside a stacked list
    val buf2 = responseWarc("Transfer-Encoding: gzip, chunked ; q=0\r\n", chunked(gz(page), 9))
    val (bts2, res2) = WebArchive.decodeHttpPayload(buf2, WebArchive.warcRecords(buf2).get.head)
    assert(bts2.sameElements(page) && res2 == "")
    // a parameterized identity is still a no-op
    val buf3 = responseWarc("Content-Encoding: identity;x=y\r\n", page)
    val (bts3, res3) = WebArchive.decodeHttpPayload(buf3, WebArchive.warcRecords(buf3).get.head)
    assert(bts3.sameElements(page) && res3 == "")
  }

  // ---- zstd (the .warc.zst layer + `Content-Encoding: zstd`).
  //      Fixtures compress through the same zstd-jni core the decoder
  //      delegates to (the container ships no second zstd
  //      implementation); what these tests pin is the CONTAINER
  //      GRAMMAR this repo owns — dictionary-frame extraction, frame
  //      walk, caps, rejects — and the ta_warc_zstd oracle pins the
  //      decoded bytes against DuckDB-stated expectations. ----

  private def zstd(payload: Array[Byte], dict: Array[Byte] = null): Array[Byte] =
    if (dict == null) com.github.luben.zstd.Zstd.compress(payload, 3)
    else {
      val ctx = new com.github.luben.zstd.ZstdCompressCtx()
      try { ctx.setLevel(3); ctx.loadDict(dict); ctx.compress(payload) }
      finally ctx.close()
    }

  private def skippableFrame(magic: Int, content: Array[Byte]): Array[Byte] = {
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    le32(magic) ++ le32(content.length) ++ content
  }

  test("unzstd: single frame and concatenated per-record frames round-trip") {
    assert(WebArchive.unzstd(zstd(b(file))).get.sameElements(b(file)))
    val cat = zstd(b(rec0)) ++ zstd(b(rec1))
    assert(WebArchive.unzstd(cat).get.sameElements(b(file)))
  }

  test("unzstd: warc-zstd dictionary frame — raw and zstd-compressed dict forms; missing dict fails loudly") {
    val dict = b("WARC/1.0\r\nWARC-Type: response\r\nHTTP/1.1 200 OK\r\nContent-Type: text/html")
    val frames = zstd(b(rec0), dict) ++ zstd(b(rec1), dict)
    val rawDictFile = skippableFrame(0x184D2A5D, dict) ++ frames
    assert(WebArchive.unzstd(rawDictFile).get.sameElements(b(file)))
    // spec'd alternative: the dictionary content is itself a zstd frame
    val zDictFile = skippableFrame(0x184D2A5D, zstd(dict)) ++ frames
    assert(WebArchive.unzstd(zDictFile).get.sameElements(b(file)))
    // dict-compressed frames WITHOUT the dictionary frame: the stream
    // must fail (None), never emit garbage
    assert(WebArchive.unzstd(frames).isEmpty)
    // a non-dictionary skippable frame (wrong magic) does NOT supply
    // the dict — same loud failure
    assert(WebArchive.unzstd(skippableFrame(0x184D2A50, dict) ++ frames).isEmpty)
  }

  test("unzstd: non-dictionary skippable frames are skipped; skippable-only input is empty output") {
    val plain = zstd(b(file))
    val lead = skippableFrame(0x184D2A51, b("segment metadata")) ++ plain
    assert(WebArchive.unzstd(lead).get.sameElements(b(file)))
    assert(WebArchive.unzstd(skippableFrame(0x184D2A51, b("only meta"))).get.isEmpty)
  }

  test("unzstd rejects: truncation, corruption, trailing garbage, truncated skippable, non-zstd") {
    val ok = zstd(b(file))
    assert(WebArchive.unzstd(ok.dropRight(3)).isEmpty)
    val corrupt = ok.clone(); corrupt(ok.length - 2) = (corrupt(ok.length - 2) ^ 0x55).toByte
    assert(WebArchive.unzstd(corrupt).isEmpty)
    assert(WebArchive.unzstd(ok ++ b("junk")).isEmpty)
    // skippable frame whose declared size runs past EOF
    assert(WebArchive.unzstd(skippableFrame(0x184D2A5D, b("dict")).dropRight(2)).isEmpty)
    assert(WebArchive.unzstd(b("not zstd at all")).isEmpty)
    assert(WebArchive.unzstd(Array[Byte]()).isEmpty)
  }

  test("unzstd: decompression-bomb cap bails during streaming, not after") {
    val bomb = zstd(new Array[Byte](4 << 20)) // 4 MiB of zeros, tiny frame
    assert(bomb.length < (64 << 10))
    assert(WebArchive.unzstd(bomb, maxOut = 1 << 20).isEmpty)
    assert(WebArchive.unzstd(bomb, maxOut = 8 << 20).get.length == (4 << 20))
  }

  test("warcRecordsAny: .warc.zst (dictionary form) parses identically to plain") {
    val dict = b(rec0.take(40))
    val zFile = skippableFrame(0x184D2A5D, dict) ++
      zstd(b(rec0), dict) ++ zstd(b(rec1), dict)
    val (raw, recs) = WebArchive.warcRecordsAny(zFile).get
    assert(recs == WebArchive.warcRecords(b(file)).get)
    assert(WebArchive.bodyString(raw, recs(1)) == html)
  }

  test("gunzipMembers: per-member compressed + output ranges; a ranged read decodes ONE record") {
    import WebArchive.MemberRange
    val gz0 = gz(b(rec0))
    val gz1 = gz(b(rec1))
    val (raw, ms) = WebArchive.gunzipMembers(gz0 ++ gz1).get
    assert(raw.sameElements(b(file)))
    assert(ms == Vector(
      MemberRange(0, gz0.length, 0, rec0.length),
      MemberRange(gz0.length, gz1.length, rec0.length, rec1.length)))
    // the serving protocol: range-read member 1's compressed bytes,
    // decompress them alone → exactly record 1
    val slice = (gz0 ++ gz1).slice(ms(1).compOff.toInt, (ms(1).compOff + ms(1).compLen).toInt)
    assert(WebArchive.gunzip(slice).get.sameElements(b(rec1)))
  }

  test("unzstdMembers: data frames are members, the dict frame is not; dict + ranged read serves one record") {
    val dict = b(rec0.take(40))
    val dictFrame = skippableFrame(0x184D2A5D, dict)
    val f0 = zstd(b(rec0), dict)
    val f1 = zstd(b(rec1), dict)
    val zFile = dictFrame ++ f0 ++ f1
    val (raw, ms) = WebArchive.unzstdMembers(zFile).get
    assert(raw.sameElements(b(file)))
    assert(ms.length == 2)
    assert(ms(0).compOff == dictFrame.length && ms(0).compLen == f0.length)
    assert(ms(0).outOff == 0 && ms(0).outLen == rec0.length)
    assert(ms(1).compOff == dictFrame.length + f0.length && ms(1).outOff == rec0.length)
    // warc-zstd serving: fetch the dictionary frame once, then
    // range-read ONE member and decompress it against the dict
    val slice = zFile.slice(ms(1).compOff.toInt, (ms(1).compOff + ms(1).compLen).toInt)
    assert(WebArchive.unzstd(dictFrame ++ slice).get.sameElements(b(rec1)))
    // a mid-stream skippable frame is walked over, never a member
    val withMeta = dictFrame ++ f0 ++ skippableFrame(0x184D2A51, b("meta")) ++ f1
    val (raw2, ms2) = WebArchive.unzstdMembers(withMeta).get
    assert(raw2.sameElements(b(file)) && ms2.length == 2)
    assert(ms2(1).compOff == dictFrame.length + f0.length + 8 + 4)
  }

  test("memberRanges: dispatches by magic; plain bytes have no member map") {
    assert(WebArchive.memberRanges(gz(b(file))).get._2.length == 1)
    assert(WebArchive.memberRanges(zstd(b(file))).get._2.length == 1)
    assert(WebArchive.memberRanges(b(file)).isEmpty)
    // malformed compressed input is None, not a partial map
    assert(WebArchive.memberRanges(gz(b(file)).dropRight(2)).isEmpty)
    assert(WebArchive.memberRanges(zstd(b(file)) ++ b("junk")).isEmpty)
  }

  test("decodeHttpPayload: CE zstd decodes (alone and under chunked); mislabel leaves residual 'zstd'") {
    val page = b("<p>zstd coded body</p>")
    def payload(hdrs: String, wire: Array[Byte]): (Array[Byte], String) = {
      val buf = responseWarc(hdrs, wire)
      WebArchive.decodeHttpPayload(buf, WebArchive.warcRecords(buf).get.head)
    }
    val (p1, r1) = payload("Content-Encoding: zstd\r\n", zstd(page))
    assert(p1.sameElements(page) && r1 == "")
    val (p2, r2) = payload("Content-Encoding: zstd\r\nTransfer-Encoding: chunked\r\n",
      chunked(zstd(page), 9))
    assert(p2.sameElements(page) && r2 == "")
    // label over plain bytes: flows raw with the evidence attached
    val (p3, r3) = payload("Content-Encoding: zstd\r\n", page)
    assert(p3.sameElements(page) && r3 == "zstd")
  }
}
