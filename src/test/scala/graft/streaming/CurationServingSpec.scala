package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Decontaminate, QualityClassifier, QualityRules}

/** The ingest-time curation SERVING chain as one composition: language
  * ID → Gopher-style rule flags → frozen-model decontamination check →
  * frozen quality-classifier score. Each stage is individually pinned
  * zero-shuffle elsewhere; this suite pins the COMPOSITION — the whole
  * chain plans as one map-only projection pipeline (zero exchanges,
  * one whole-stage codegen pass over each arriving document) and drops
  * into a real `readStream` unchanged, producing exactly the batch
  * result. This is the 100 TB deployment shape: frozen artifacts
  * (weights, eval gram set) broadcast once, every arriving document
  * scored row-locally with no shuffle anywhere.
  */
class CurationServingSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "source", "text")

  /** the frozen artifacts a deployment trains offline. */
  private lazy val weights =
    QualityClassifier.trainWeights(
      docs, "doc_id", "text",
      TextFunctions.qualityScorePpm(col("text")) >= 500000, iters = 2)
  private lazy val evalSet = docs.filter(col("doc_id") % 17 === 0)

  /** the serving chain, applicable to a batch OR streaming frame. */
  private def serve(df: DataFrame): DataFrame = {
    val s1 = df.withColumn("lang", TextFunctions.langId(col("text")))
    val s2 = QualityRules.ruleFlags(s1, "text")
    val s3 = Decontaminate.flagStreaming(s2, evalSet, "doc_id", "text", n = 5)
    QualityClassifier.scoreAgainst(weights, s3, "doc_id", "text",
      keep = Seq("lang", "pass", "contaminated"))
  }

  test("the full serving chain plans zero exchanges (one codegen pass per doc)") {
    val plan = serve(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"curation serving chain shuffled:\n$plan")
    assert(!plan.contains("Join"), s"curation serving chain joined:\n$plan")
  }

  test("the chain drives as ONE readStream and equals the batch result") {
    val in = docs.limit(120)
    val dir = java.nio.file.Files.createTempDirectory("graft-curation-stream").toString
    in.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(in.schema).parquet(s"$dir/in")
    val q = serve(stream)
      .writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row): (Long, String, Boolean, Boolean, Long, Long, Int) =
      (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3),
        r.getLong(4), r.getLong(5), r.getInt(6))
    val streamed = spark.table("curation_stream").collect().map(key).toSet
    val batch = serve(in).collect().map(key).toSet
    assert(streamed == batch, "stream curation must equal batch curation")
    assert(streamed.nonEmpty)
    // the chain produces non-degenerate decisions on real data
    assert(streamed.exists(_._4) && streamed.exists(!_._4),
      "contamination flag never varies — eval carve-out broken")
  }

  test("the crawl-ingest chain (WARC→HTML→text→URL) drives as ONE readStream, equals batch") {
    // the front half of a crawl deployment: archives arrive as a
    // stream, and record walk → body slice → boilerplate strip →
    // URL canonicalization all happen in the arriving micro-batch
    // with zero shuffle — the fingerprint/quality chain above then
    // consumes the extracted text incrementally.
    import spark.implicits._
    import graft.operators.{Multimodal, WebArchive}
    import graft.functions.WebFunctions
    // bodies carry the REAL archive wire shapes (r14): every 3rd doc
    // chunked, every 5th gzip-encoded, every 7th latin-1 — the
    // decode layers must behave identically in the micro-batch
    def warcOf(id: Long, uri: String, html: String): Multimodal.MediaRow = {
      def gz(b: Array[Byte]): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
        bos.toByteArray
      }
      val page = if (id % 7 == 0) ("café " + html) else html
      val raw =
        if (id % 7 == 0) page.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        else page.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val encBody = if (id % 5 == 0) gz(raw) else raw
      val wire =
        if (id % 3 == 0) {
          val bos = new java.io.ByteArrayOutputStream()
          encBody.grouped(13).foreach { c =>
            bos.write((c.length.toHexString + "\r\n").getBytes("US-ASCII"))
            bos.write(c); bos.write("\r\n".getBytes("US-ASCII"))
          }
          bos.write("0\r\n\r\n".getBytes("US-ASCII"))
          bos.toByteArray
        } else encBody
      val hdrs = (if (id % 5 == 0) "Content-Encoding: gzip\r\n" else "") +
        (if (id % 3 == 0) "Transfer-Encoding: chunked\r\n" else "")
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n$hdrs\r\n"
        .getBytes("US-ASCII") ++ wire
      val rec = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII") ++
        http ++ "\r\n\r\n".getBytes("US-ASCII")
      Multimodal.MediaRow(id, "warc", gz(rec)) // .warc.gz on the stream
    }
    val rows = (1L to 40L).map(i => warcOf(i,
      s"HTTP://WWW.Example.COM:80/p/$i/?utm_source=s&b=$i&a=1",
      s"<html><body><p>doc $i body</p><script>var a=$i;</script></body></html>"))
    def serve(ds: org.apache.spark.sql.Dataset[Multimodal.MediaRow]) =
      Multimodal.warcResponses(ds).toDF()
        .select(col("doc_id"),
          WebFunctions.canonicalizeUrl(col("target_uri")).as("url_canon"),
          WebFunctions.htmlToText(col("body")).as("clean"))
    val dir = java.nio.file.Files.createTempDirectory("graft-crawl-stream").toString
    rows.toDS().write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(rows.toDS().schema).parquet(s"$dir/in")
      .as[Multimodal.MediaRow]
    val q = serve(stream)
      .writeStream.format("memory").queryName("crawl_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getString(1), r.getString(2))
    val streamed = spark.table("crawl_stream").collect().map(key).toSet
    val batch = serve(rows.toDS()).collect().map(key).toSet
    assert(streamed == batch && streamed.size == 40)
    assert(streamed.head._2.startsWith("http://example.com/p/"))
    assert(streamed.forall { case (id, u, t) =>
      u == s"http://example.com/p/$id?a=1&b=$id" &&
        t == (if (id % 7 == 0) s"café doc $id body" else s"doc $id body") })
    // and the streaming plan shuffles nothing
    val plan = serve(rows.toDS()).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"crawl-ingest chain must stay map-only:\n$plan")
  }

  test("the host-rank gate (frozen rank dim onto the page stream) drives as readStream, equals batch") {
    // the serving half of LinkRank: rank is computed OFFLINE on the
    // link graph (a frozen dim-sized artifact, like the classifier
    // weights above), and every arriving page is annotated with its
    // host's score via a broadcast join — the page side never
    // shuffles, batch or stream.
    import spark.implicits._
    import graft.operators.LinkRank
    val edges = Seq.tabulate(40)(i => (s"h${i % 6}.com", s"h${(i * 5) % 9}.com"))
      .toDF("src", "dst")
    val rank = LinkRank.hostRank(edges, iterations = 3, maxOutDegree = 4,
      graphPartitions = 2).select(col("host"), col("rank"))
    // left join: pages on never-linked hosts must FLOW with rank 0,
    // not vanish at the gate
    def gate(df: DataFrame): DataFrame =
      df.join(broadcast(rank), Seq("host"), "left")
        .select(col("doc_id"), col("host"),
          coalesce(col("rank"), lit(0L)).as("host_rank"))
    val pages = (1L to 60L).map(i => (i, s"h${i % 11}.com")).toDF("doc_id", "host")
    val dir = java.nio.file.Files.createTempDirectory("graft-rankgate-stream").toString
    pages.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(pages.schema).parquet(s"$dir/in")
    val q = gate(stream)
      .writeStream.format("memory").queryName("rankgate_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getString(1), r.getLong(2))
    val streamed = spark.table("rankgate_stream").collect().map(key).toSet
    val batch = gate(pages).collect().map(key).toSet
    assert(streamed == batch && streamed.size == 60,
      "stream rank gate must equal batch rank gate")
    // non-degenerate: ranked hosts score > 0, unranked (h9/h10) hit 0
    assert(streamed.exists(_._3 > 0L) && streamed.exists(_._3 == 0L))
    // the dim broadcasts; the page side never shuffles
    val plan = gate(pages).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rank dim must broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"page side must not shuffle:\n$plan")
  }
}
