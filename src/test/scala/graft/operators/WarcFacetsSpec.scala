package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal.MediaRow

/** Parity pins for the single-pass WARC facet walk: every facet
  * operator is a narrow projection of [[Multimodal.warcFacets]], so
  * each projection is compared against expectations derived by calling
  * [[WebArchive]] DIRECTLY on the fixture bytes (the pre-facet
  * semantics), not against the projections themselves — a shared walk
  * bug cannot self-certify. The corpus-facing oracles (`ta_warc_*`)
  * re-drive the same walk at three SFs.
  */
class WarcFacetsSpec extends SparkSpec {

  private def b(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def rec(tpe: String, uri: String, http: Array[Byte],
                  digest: String = ""): Array[Byte] = {
    val dig = if (digest.isEmpty) "" else s"WARC-Payload-Digest: $digest\r\n"
    b(s"WARC/1.0\r\nWARC-Type: $tpe\r\nWARC-Target-URI: $uri\r\n" + dig +
      s"Content-Length: ${http.length}\r\n\r\n") ++ http ++ b("\r\n\r\n")
  }
  private def respHttp(status: Int, headers: String, body: Array[Byte]): Array[Byte] =
    b(s"HTTP/1.1 $status OK\r\nContent-Type: text/html\r\n$headers\r\n") ++ body

  private def gz(x: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos); g.write(x); g.close()
    bos.toByteArray
  }

  // one archive exercising every facet class: a text response with a
  // digest, a gzip-coded response, a binary response (no text facet),
  // a 302 redirect, a revisit, and a warcinfo record
  private val page = b("<p>facet page</p>")
  private val archive: Array[Byte] =
    rec("warcinfo", "", b("software: x")) ++
      rec("response", "http://a.com/p", respHttp(200, "", page), "sha1:P") ++
      rec("response", "http://a.com/gz", respHttp(200, "Content-Encoding: gzip\r\n", gz(page))) ++
      rec("response", "http://a.com/bin", respHttp(200, "", Array[Byte](0, 1, 2, 3))) ++
      rec("response", "http://a.com/old", respHttp(302, "Location: http://a.com/p\r\n",
        Array.emptyByteArray)) ++
      rec("revisit", "http://a.com/r", respHttp(200, "", Array.emptyByteArray), "sha1:P")

  private def media: org.apache.spark.sql.Dataset[MediaRow] = {
    import spark.implicits._
    Seq(MediaRow(7L, "warc", archive)).toDS().repartition(2)
  }

  // the independent expectation: the direct parser walk
  private val (raw, direct) = WebArchive.warcRecordsAny(archive).get

  test("warcFacets: one row per record, facts equal the direct parser walk") {
    val rows = Multimodal.warcFacets(media).collect().sortBy(_.idx)
    assert(rows.length == direct.length)
    for ((f, w) <- rows.zip(direct)) {
      assert(f.doc_id == 7L && f.idx == w.idx && f.warc_type == w.warcType)
      assert(f.target_uri == w.targetUri && f.content_length == w.contentLength)
      assert(f.http_status == w.httpStatus && f.mime == w.contentType)
      assert(f.payload_digest == w.payloadDigest && f.location == w.location)
      assert(f.header_offset == w.headerOffset && f.body_offset == w.bodyOffset)
      assert(f.body_length == w.bodyLength)
      assert(f.rec_length == w.bodyOffset + w.bodyLength - w.headerOffset)
    }
    // text facet: decoded responses carry text, binary/non-response do not
    val byIdx = rows.map(f => f.idx -> f).toMap
    assert(byIdx(1).has_text && byIdx(1).body == "<p>facet page</p>"
      && byIdx(1).coding_residual == "")
    assert(byIdx(2).has_text && byIdx(2).body == "<p>facet page</p>") // gunzipped in-pass
    assert(!byIdx(3).has_text && byIdx(3).body == "") // binary payload: no text facet
    assert(byIdx(4).has_text && byIdx(4).body == "" && byIdx(4).location == "http://a.com/p")
    assert(!byIdx(5).has_text && byIdx(5).payload_digest == "sha1:P") // revisit: typed off
  }

  test("withText=false skips the decode but keeps every metadata facet identical") {
    val lite = Multimodal.warcFacets(media, withText = false).collect().sortBy(_.idx)
    val full = Multimodal.warcFacets(media).collect().sortBy(_.idx)
    for ((l, f) <- lite.zip(full)) {
      assert(!l.has_text && l.body == "" && l.charset == "")
      assert(l.copy(has_text = f.has_text, charset = f.charset, body = f.body,
        coding_residual = f.coding_residual) == f)
    }
  }

  test("each facet operator equals its direct-parser expectation") {
    // record map
    val recRows = Multimodal.warcRecords(media).collect().sortBy(_.idx)
    assert(recRows.map(r => (r.idx, r.warc_type, r.target_uri, r.content_length,
      r.http_status, r.header_offset, r.body_offset, r.body_length)).toSeq ==
      direct.map(w => (w.idx, w.warcType, w.targetUri, w.contentLength,
        w.httpStatus, w.headerOffset, w.bodyOffset, w.bodyLength)).toSeq)
    // cdx
    val cdx = Multimodal.warcCdx(media).collect().sortBy(_.idx)
    assert(cdx.map(c => (c.idx, c.url, c.warc_type, c.mime, c.http_status,
      c.payload_digest, c.offset, c.rec_length)).toSeq ==
      direct.map(w => (w.idx, w.targetUri, w.warcType, w.contentType, w.httpStatus,
        w.payloadDigest, w.headerOffset, w.bodyOffset + w.bodyLength - w.headerOffset)).toSeq)
    // redirects: exactly the 302 with its Location
    val red = Multimodal.warcRedirects(media).collect()
    assert(red.map(r => (r.idx, r.from_uri, r.http_status, r.to_uri)).toSeq ==
      Seq((4, "http://a.com/old", 302, "http://a.com/p")))
    // revisits: exactly the digest-bearing revisit record
    val rev = Multimodal.warcRevisits(media).collect()
    assert(rev.map(r => (r.idx, r.target_uri, r.payload_digest)).toSeq ==
      Seq((5, "http://a.com/r", "sha1:P")))
    // responses: the three text-decodable response records, decoded
    val resp = Multimodal.warcResponses(media).collect().sortBy(_.idx)
    assert(resp.map(r => (r.idx, r.target_uri, r.http_status, r.body,
      r.coding_residual, r.payload_digest)).toSeq == Seq(
      (1, "http://a.com/p", 200, "<p>facet page</p>", "", "sha1:P"),
      (2, "http://a.com/gz", 200, "<p>facet page</p>", "", ""),
      (4, "http://a.com/old", 302, "", "", "")))
  }

  test("unparseable archives degrade to zero facet rows, never a task failure") {
    import spark.implicits._
    val junk = Seq(MediaRow(1L, "warc", b("not a warc at all")),
      MediaRow(2L, "warc", Array.emptyByteArray)).toDS()
    assert(Multimodal.warcFacets(junk).count() == 0L)
  }
}
