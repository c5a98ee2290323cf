package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KMV set-overlap: exact below k, boundary cases (disjoint,
  * identical), and estimator accuracy on saturated sketches.
  */
class KmvJaccardSpec extends SparkSpec {

  import spark.implicits._

  private def sketch(vals: Seq[Long], k: Int) =
    Profile.distinctKmvSketch(
      vals.map(v => ("g", v)).toDF("g", "v"), Seq("g"), "v", k)

  private def overlap(a: Seq[Long], b: Seq[Long], k: Int) =
    Profile.kmvJaccard(sketch(a, k), sketch(b, k), Seq("g"), k)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).head

  test("below k everything is exact") {
    // A = {1..10}, B = {6..20}: inter 5, union 20, J = 250000 ppm
    val (jn, jd, jp, eu, ei) = overlap(1L to 10L, 6L to 20L, k = 64)
    assert((jn, jd, jp, eu) == (5L, 20L, 250000L, 20L))
    assert(ei == 5L)
  }

  test("disjoint and identical sets hit the boundaries") {
    val (jn0, _, jp0, _, ei0) = overlap(1L to 50L, 100L to 150L, k = 32)
    assert(jn0 == 0L && jp0 == 0L && ei0 == 0L)
    val (jn1, jd1, jp1, eu1, ei1) = overlap(1L to 500L, 1L to 500L, k = 32)
    assert(jn1 == jd1 && jp1 == 1000000L && ei1 == eu1)
  }

  test("saturated sketches estimate jaccard/union/intersection within bounds") {
    // A = 1..3000, B = 2001..6000: inter 1000, union 6000, J = 1/6
    val (jn, jd, jp, eu, ei) = overlap(1L to 3000L, 2001L to 6000L, k = 256)
    assert(jd == 256L && jn > 0L)
    assert(math.abs(jp - 166667L) < 80000L, s"jaccard_ppm $jp far from 1/6")
    assert(math.abs(eu - 6000L) < 900L, s"est_union $eu far from 6000")
    assert(math.abs(ei - 1000L) < 500L, s"est_intersection $ei far from 1000")
  }

  test("overlap math is row-local: no shuffle after the sketch join") {
    val df = Profile.kmvJaccard(
      sketch(1L to 1000L, 64), sketch(500L to 1500L, 64), Seq("g"), 64)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"window in overlap math:\n$p")
    // exactly the sketches' aggregations — no extra exchange for the
    // array arithmetic itself
    assert(!p.contains("CartesianProduct"))
  }
}
