package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Layout operator: range-partitioned sorted writes must produce
  * non-overlapping per-file key ranges (the property that makes
  * footer-stats file skipping work) and a plan with RangePartitioning +
  * in-partition Sort.
  */
class LayoutSpec extends SparkSpec {

  test("plan shape: range exchange + in-partition sort, no global sort") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong * 7 % 997, s"v$i")).toDF("k", "v")
    val p = Layout.sorted(df, 4, col("k")).queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"), s"no range exchange:\n$p")
    // "Sort [...], false, 0" — the second field is the global flag
    assert("""Sort \[[^\]]*\], false""".r.findFirstIn(p).isDefined,
      s"no in-partition (non-global) sort:\n$p")
  }

  test("written files have non-overlapping key ranges and all rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-layout").toString + "/out"
    val df = (1 to 5000).map(i => ((i.toLong * 31) % 4999, i.toLong)).toDF("k", "id")
    Layout.writeSorted(df, dir, 5, col("k"))

    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    val ranges = Layout.fileRanges(back, "k")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length >= 2, "expected multiple files")
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA <= loB, s"overlapping file ranges: $ranges")
      case _ =>
    }
  }

  test("co-bucketed tables join with zero exchanges on either side") {
    import spark.implicits._
    val facts = (1L to 2000L).map(i => (i % 97, i, s"f$i")).toDF("key", "id", "payload")
    val dims = (1L to 1500L).map(i => (i % 97, i * 3)).toDF("key", "qty")
    // broadcast off: the point is the big-big shape where neither side fits
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Layout.writeBucketed(facts, "graft_bkt_a", buckets = 8, key = "key")
      Layout.writeBucketed(dims, "graft_bkt_b", buckets = 8, key = "key")
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "key")
      assert(joined.count() ==
        facts.join(dims, "key").count(), "bucketed join changed results")
      val p = joined.queryExecution.executedPlan.toString
      // co-located: Spark trusts the on-disk hash partitioning — a join
      // of two co-bucketed tables must not shuffle EITHER side
      assert(!p.contains("Exchange hashpartitioning"),
        s"co-bucketed join still exchanges:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("scan with a key predicate reads fewer files than the total") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-layout2").toString + "/out"
    val df = (1 to 5000).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    Layout.writeSorted(df, dir, 5, col("k"))
    // a narrow range predicate lands in one range-partitioned file; the
    // executed scan must not read all of them
    val narrow = spark.read.parquet(dir).filter(col("k") >= 100 && col("k") <= 200)
    assert(narrow.count() == 101)
    val files = narrow.select(input_file_name()).distinct().count()
    assert(files == 1L, s"predicate touched $files files, expected 1")
  }

  test("z-order key interleaves bits exactly") {
    import spark.implicits._
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }.sum
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (70000L, 3L)) // 70000 masks down to 16 bits
    val df = cases.toDF("a", "b")
    val got = df.select(Layout.zOrderKey(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val want = cases.map { case (a, b) => ref(a & 65535L, b & 65535L, 16) }
    assert(got == want, s"got=$got want=$want")
  }

  test("z-order layout prunes on the SECOND dimension where linear order cannot") {
    import spark.implicits._
    // a 64x64 grid: every (a, b) combination once
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val zdir = Files.createTempDirectory("graft-z").toString + "/z"
    val ldir = Files.createTempDirectory("graft-z").toString + "/linear"
    Layout.writeZOrdered(grid, zdir, 16, col("a"), col("b"))
    Layout.writeSorted(grid.withColumn("__zkey", lit(0L)), ldir, 16, col("a"))
    def filesMatching(dir: String): Long =
      spark.read.parquet(dir).filter(col("b") < 8)
        .select(input_file_name()).distinct().count()
    val zFiles = filesMatching(zdir)
    val lFiles = filesMatching(ldir)
    // linear order on `a` spreads every b-slice over ALL files; the
    // curve confines a b-range to a subset of tiles
    assert(lFiles == 16L, s"linear layout should spread b over all files, got $lFiles")
    assert(zFiles <= 8L, s"z-order should confine the b-slice, got $zFiles of 16 files")
  }
}
