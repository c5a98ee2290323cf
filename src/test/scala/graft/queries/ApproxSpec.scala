package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Error bounds for the sketch-based operators (HLL distinct,
  * approximate percentiles) — sketches never hash-match across engines,
  * so the DuckDB gate can't cover them; these specs pin accuracy
  * against the exact computation instead.
  */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within its configured 2% rsd (5% tolerance) of exact") {
    val e = Tables(spark, dir, "events")
    val approx = e.groupBy("event_type")
      .agg(approx_count_distinct("user_id", 0.02).as("ap"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = e.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex <= 0.05, s"$k: approx $ap vs exact $ex")
    }
  }

  test("dd_approx_distinct reports the sketch inside its bound (hll_ok) and exact counts") {
    val rows = graft.SparkEntry.queries("dd_approx_distinct")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(3))).toList
    assert(rows.nonEmpty)
    rows.foreach { case (k, exactUsers, ok) =>
      assert(ok, s"$k: sketch outside 10% of exact ($exactUsers)")
      assert(exactUsers > 0)
    }
  }

  test("percentile_approx tracks exact percentile within accuracy bound") {
    val li = Tables(spark, dir, "lineitem")
    val row = li.agg(
      percentile(col("l_quantity"), lit(0.5)).as("exact"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("approx")).head()
    val (ex, ap) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(ap - ex) <= 1.0, s"p50 approx $ap vs exact $ex")
  }

  test("dd_quantile_sketch reports every group's sketch inside its bound (qs_ok)") {
    val rows = graft.SparkEntry.queries("dd_quantile_sketch")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(4))).toList
    assert(rows.nonEmpty)
    rows.foreach { case (k, p50, ok) =>
      assert(ok, s"$k: sketch median outside 5% of range (exact p50 $p50)")
    }
  }
}
