package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The CDX serving layout: SURT urlkey + range-partitioned sorted
  * write must make one domain family's lookups touch 1-of-N index
  * files. Proven from the same footer min/max stats the scan skips on
  * ([[Layout.fileRanges]]), plus the key-contiguity property that
  * makes it possible (SURT reversal groups a host AND its subdomains
  * under one key prefix).
  */
class CdxLayoutSpec extends SparkSpec {

  private val families = ('a' to 'l').map(c => s"site$c") // 12 families

  private lazy val cdx = {
    import spark.implicits._
    val hostRows = for {
      f <- families
      i <- 1 to 280
    } yield (s"http://$f.com/p/$i", i.toLong, (i * 512).toLong)
    // three families also have a subdomain — SURT must keep those in
    // the same family prefix range as the apex host
    val subRows = for {
      f <- families.take(3)
      i <- 1 to 20
    } yield (s"http://sub.$f.com/q/$i", i.toLong, (i * 512).toLong)
    (hostRows ++ subRows).toDF("url", "doc_id", "offset")
  }

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-cdx").toString + "/idx"
    CdxIndex.write(cdx, d, numFiles = 4)
    d
  }

  test("written index has non-overlapping per-file urlkey ranges") {
    val back = spark.read.parquet(dir)
    assert(back.count() == cdx.count())
    val ranges = Layout.fileRanges(back, "urlkey")
      .collect().map(r => (r.getString(1), r.getString(2))).sortBy(_._1)
    assert(ranges.length == 4, s"expected 4 files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA <= loB, s"overlapping file ranges: ${ranges.mkString(", ")}")
      case _ =>
    }
  }

  test("a domain-family lookup prunes to 1-of-N files (footer-range audit)") {
    val perFamily = families.map { f =>
      f -> CdxIndex.filesForPrefix(spark, dir, s"com,$f").count()
    }
    // a family can straddle at most one partition boundary; with 3
    // internal boundaries at least 9 of 12 families live in ONE file
    perFamily.foreach { case (f, n) =>
      assert(n >= 1 && n <= 2, s"family $f spans $n of 4 files")
    }
    assert(perFamily.count(_._2 == 1L) >= 9,
      s"most families must prune to 1-of-4: $perFamily")
  }

  test("prefix lookup returns exactly the family's rows, subdomains included") {
    val f = families.head
    val got = CdxIndex.lookupPrefix(spark, dir, s"com,$f")
      .select("url").collect().map(_.getString(0)).toSet
    val want = cdx.where(col("url").contains(s"$f.com"))
      .select("url").collect().map(_.getString(0)).toSet
    assert(got == want && want.size == 300) // 280 apex + 20 subdomain
    // host-exact lookup excludes the subdomain rows
    val apex = CdxIndex.lookupPrefix(spark, dir, s"com,$f)").count()
    assert(apex == 280)
  }

  test("urlkey contiguity: every family is one consecutive run in global key order") {
    val keys = spark.read.parquet(dir).select("urlkey")
      .collect().map(_.getString(0)).sorted
    for (f <- families) {
      val idx = keys.zipWithIndex.filter(_._1.startsWith(s"com,$f")).map(_._2)
      assert(idx.nonEmpty && idx.last - idx.head + 1 == idx.length,
        s"family $f keys are not contiguous in key order")
    }
  }

  test("the lookup plan pushes the prefix to the scan") {
    val p = CdxIndex.lookupPrefix(spark, dir, "com,sitea)")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("StringStartsWith(urlkey,com,sitea))"),
      s"prefix filter not pushed to parquet:\n$p")
  }

  test("end-to-end replay: index lookup → ranged read → dict decode serves ONE record") {
    import spark.implicits._
    // four .warc.zst archives on disk, 30 records each, warc-zstd
    // layout (dict frame + one frame per record)
    def record(a: Int, i: Int): Array[Byte] = {
      val body = s"<p>archive $a page $i</p>"
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$body"
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: http://fam$a.org/p/$i\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n$http\r\n\r\n").getBytes("US-ASCII")
    }
    val dict = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://"
      .getBytes("US-ASCII")
    def zstArchive(a: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = {
        bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
        bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
      }
      le32(0x184D2A5D); le32(dict.length); bos.write(dict)
      val ctx = new com.github.luben.zstd.ZstdCompressCtx()
      try {
        ctx.setLevel(3); ctx.loadDict(dict)
        (0 until 30).foreach(i => bos.write(ctx.compress(record(a, i))))
      } finally ctx.close()
      bos.toByteArray
    }
    val arcDir = Files.createTempDirectory("graft-warc").toString
    val paths = (0 until 4).map { a =>
      val p = s"$arcDir/arc$a.warc.zst"
      Files.write(java.nio.file.Paths.get(p), zstArchive(a))
      a.toLong -> p
    }.toMap
    // index with member ranges + the archive filename (what real CDX
    // rows carry), laid out SURT-keyed
    val rows = Multimodal.warcCdxMembers(
      paths.toSeq.map { case (a, p) =>
        Multimodal.MediaRow(a, "warc",
          Files.readAllBytes(java.nio.file.Paths.get(p)))
      }.toDS()).toDF()
    val idxDir = s"$arcDir/idx"
    CdxIndex.write(
      rows.withColumn("filename",
        concat(lit(s"$arcDir/arc"), col("doc_id"), lit(".warc.zst"))),
      idxDir, numFiles = 2)
    // the replay path for http://fam2.org/p/17 — index row, ranged
    // read, dict fetched once from the file head, member decode
    val hit = CdxIndex.lookupPrefix(spark, idxDir, "org,fam2)/p/17")
      .select("filename", "member_offset", "member_length").collect()
    assert(hit.length == 1)
    val (file, mo, ml) = (hit(0).getString(0), hit(0).getLong(1), hit(0).getLong(2))
    assert(mo > 0 && ml > 0 && ml < 200) // a record's frame, not the file
    val member = CdxIndex.readRange(file, mo, ml)
    val head = CdxIndex.readRange(file, 0, 256)
    val d = WebArchive.archiveDict(head).get
    assert(d.sameElements(dict))
    val served = WebArchive.decodeMember(member, d).get
    assert(served.sameElements(record(2, 17)))
    // the decoded member is itself a parseable one-record WARC
    val rec = WebArchive.warcRecords(served).get
    assert(rec.length == 1 && rec.head.targetUri == "http://fam2.org/p/17")
    // without the dictionary the member must refuse, never mojibake
    assert(WebArchive.decodeMember(member, null).isEmpty)
    // the same protocol serves a .warc.gz member (dict-less)
    def gz(p: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(p); g.close(); bos.toByteArray
    }
    val gzPath = s"$arcDir/arc9.warc.gz"
    Files.write(java.nio.file.Paths.get(gzPath),
      gz(record(9, 1)) ++ gz(record(9, 2)))
    val gzRows = Multimodal.warcCdxMembers(Seq(
      Multimodal.MediaRow(9L, "warc",
        Files.readAllBytes(java.nio.file.Paths.get(gzPath)))).toDS()).collect()
    val r2 = gzRows.find(_.url.endsWith("/p/2")).get
    val served2 = WebArchive.decodeMember(
      CdxIndex.readRange(gzPath, r2.member_offset, r2.member_length), null).get
    assert(served2.sameElements(record(9, 2)))
  }
}
