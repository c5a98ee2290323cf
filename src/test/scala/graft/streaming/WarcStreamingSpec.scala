package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Archives arrive as BATCHES in a real ingest, so the map-only WARC
  * facet operators must run unchanged on a streaming Dataset and emit
  * the SAME rows as the batch walk over the union of the batches —
  * CDX index maintenance is then just `writeStream` on the same
  * operator (no state, no watermark: one archive in, its index rows
  * out).
  */
class WarcStreamingSpec extends SparkSpec {

  private def b(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def archive(id: Long): Array[Byte] = {
    val page = s"<p>page $id</p>"
    val http = b(s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$page")
    val resp = b(s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://h${id % 5}.com/p/$id\r\n" +
      s"WARC-Payload-Digest: sha1:D$id\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n") ++ http ++ b("\r\n\r\n")
    val redirHttp = b(s"HTTP/1.1 301 OK\r\nLocation: http://h${id % 5}.com/p/$id\r\n\r\n")
    val redir = b(s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://h${id % 5}.com/old/$id\r\n" +
      s"Content-Length: ${redirHttp.length}\r\n\r\n") ++ redirHttp ++ b("\r\n\r\n")
    resp ++ redir
  }

  test("streaming warcCdx equals the batch index over the union of micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[MediaRow]
    val query = Multimodal.warcCdx(input.toDS()).toDF()
      .writeStream.format("memory").queryName("warc_cdx_stream")
      .outputMode("append").start()
    try {
      input.addData((0L until 6L).map(i => MediaRow(i, "warc", archive(i))))
      query.processAllAvailable()
      input.addData((6L until 10L).map(i => MediaRow(i, "warc", archive(i))))
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("warc_cdx_stream")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4), r.getInt(5), r.getString(6), r.getLong(7), r.getLong(8))).toSet
    val batch = Multimodal.warcCdx(
        (0L until 10L).map(i => MediaRow(i, "warc", archive(i))).toDS())
      .collect().map(c => (c.doc_id, c.idx, c.url, c.warc_type, c.mime,
        c.http_status, c.payload_digest, c.offset, c.rec_length)).toSet
    assert(streamed.size == 20 && streamed == batch)
  }

  test("streaming warcCdxMembers: compressed-member CDX rows equal the batch map") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // ship each archive as a 2-member .warc.gz so the member columns
    // are live (per-record members), not the plain-input -1 degrade
    def gzArchive(id: Long): Array[Byte] = {
      val whole = archive(id)
      // split at the second record's start: both records gzip alone
      val recs = graft.operators.WebArchive.warcRecords(whole).get
      val cut = recs(1).headerOffset.toInt
      def gz(p: Array[Byte]): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(p); g.close(); bos.toByteArray
      }
      gz(whole.take(cut)) ++ gz(whole.drop(cut))
    }
    val input = MemoryStream[MediaRow]
    val query = Multimodal.warcCdxMembers(input.toDS()).toDF()
      .writeStream.format("memory").queryName("warc_cdx_members_stream")
      .outputMode("append").start()
    try {
      input.addData((0L until 4L).map(i => MediaRow(i, "warc", gzArchive(i))))
      query.processAllAvailable()
      input.addData((4L until 7L).map(i => MediaRow(i, "warc", gzArchive(i))))
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("warc_cdx_members_stream")
      .selectExpr("doc_id", "idx", "url", "member_idx", "member_offset", "member_length")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3), r.getLong(4), r.getLong(5))).toSet
    val batch = Multimodal.warcCdxMembers(
        (0L until 7L).map(i => MediaRow(i, "warc", gzArchive(i))).toDS())
      .collect().map(c => (c.doc_id, c.idx, c.url, c.member_idx,
        c.member_offset, c.member_length)).toSet
    assert(streamed.size == 14 && streamed == batch)
    // each record landed in its own member
    assert(streamed.forall { case (_, idx, _, m, off, len) =>
      m == idx && off >= 0 && len > 0 })
  }

  test("streaming warcFacets: redirect and text facets flow per micro-batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[MediaRow]
    val query = Multimodal.warcFacets(input.toDS()).toDF()
      .writeStream.format("memory").queryName("warc_facets_stream")
      .outputMode("append").start()
    try {
      input.addData(Seq(MediaRow(1L, "warc", archive(1L))))
      query.processAllAvailable()
    } finally query.stop()
    val rows = spark.table("warc_facets_stream")
    assert(rows.count() == 2)
    assert(rows.where(org.apache.spark.sql.functions.col("has_text"))
      .select("body").collect().map(_.getString(0)).toSet ==
      Set("<p>page 1</p>", "")) // the 301's empty body decodes empty
    assert(rows.where("http_status = 301").select("location")
      .collect().map(_.getString(0)).toSeq == Seq("http://h1.com/p/1"))
  }
}
