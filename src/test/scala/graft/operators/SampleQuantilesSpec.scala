package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic-sample quantiles: exact below k, estimator accuracy,
  * order-independence, and the boundary percents.
  */
class SampleQuantilesSpec extends SparkSpec {

  import spark.implicits._

  test("below k the quantiles are the exact type-1 order statistics") {
    val df = (1L to 50L).map(i => ("g", i, i * 2.0)).toDF("g", "id", "v")
    val out = Profile.sampleQuantiles(df, Seq("g"), "id", "v",
        k = 256, percents = Seq(0, 50, 100))
      .collect().head
    // whole group sampled: sorted values 2..100 step 2, m = 50
    // p0 -> idx 1; p50 -> 1 + (50*49) DIV 100 = 25; p100 -> 50
    assert(out.getLong(1) == 50L)
    assert(out.getDouble(2) == 2.0)
    assert(out.getDouble(3) == 50.0)
    assert(out.getDouble(4) == 100.0)
  }

  test("saturated sample estimates quantiles within tolerance") {
    val df = (1L to 20000L).map(i => ("g", i, i.toDouble)).toDF("g", "id", "v")
    val out = Profile.sampleQuantiles(df, Seq("g"), "id", "v",
        k = 256, percents = Seq(50, 90)).collect().head
    assert(out.getLong(1) == 256L)
    assert(math.abs(out.getDouble(2) - 10000.0) < 2000.0, s"p50=${out.getDouble(2)}")
    assert(math.abs(out.getDouble(3) - 18000.0) < 2000.0, s"p90=${out.getDouble(3)}")
  }

  test("sample membership is independent of row order and partitioning") {
    val rows = (1L to 5000L).map(i => ("g", i, (i * 37 % 1001).toDouble))
    val a = Profile.sampleQuantiles(rows.toDF("g", "id", "v"), Seq("g"), "id", "v", k = 64)
      .collect().head.toSeq
    val b = Profile.sampleQuantiles(
        rows.reverse.toDF("g", "id", "v").repartition(13), Seq("g"), "id", "v", k = 64)
      .collect().head.toSeq
    assert(a == b)
  }

  test("groups are independent; nulls excluded") {
    val df = Seq(("a", 1L, Some(1.0)), ("a", 2L, Some(3.0)), ("a", 3L, None),
      ("b", 4L, Some(9.0))).toDF("g", "id", "v")
    val out = Profile.sampleQuantiles(df, Seq("g"), "id", "v", k = 8, percents = Seq(50))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // group a: values (1,3), m=2, p50 -> idx 1 + (50*1) DIV 100 = 1 -> 1.0
    assert(out.toSeq == Seq(("a", 2L, 1.0), ("b", 1L, 9.0)))
  }

  test("plan: k-bounded partial aggregate, no window, no global sort") {
    val df = Profile.sampleQuantiles(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"),
      Seq("event_type"), "event_id", "value", k = 64)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_topk"), s"no map-side partial top-k:\n$p")
    assert(!p.contains("Window"), s"window in plan:\n$p")
  }
}
