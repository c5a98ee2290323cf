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
}
