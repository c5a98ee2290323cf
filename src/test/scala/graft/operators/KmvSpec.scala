package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Kernels, TextFunctions}

/** KMV distinct sketch: hash uniformity, exact-branch semantics, the
  * estimator's accuracy contract, union-mergeability, and the
  * no-window k-bounded plan.
  */
class KmvSpec extends SparkSpec {

  private val R = TextFunctions.P * Kernels.P2

  test("sketch keeps the k smallest distinct hashes, ascending") {
    import spark.implicits._
    val df = (1L to 500L).map(i => ("g", i)).toDF("g", "v")
    val sk = Profile.distinctKmvSketch(df, Seq("g"), "v", k = 16)
      .collect().map(_.getSeq[Long](1))
    assert(sk.length == 1)
    val kept = sk.head
    assert(kept.length == 16)
    assert(kept == kept.sorted, "kmv array not ascending")
    // independently recompute all 500 hashes and take the 16 smallest
    val all = df.select(TextFunctions.kmvHash(col("v").cast("string")).as("h"))
      .collect().map(_.getLong(0)).distinct.sorted.take(16).toSeq
    assert(kept == all)
  }

  test("below k the estimate is the exact distinct count; nulls ignored") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", Some(1L)), ("a", Some(2L)),
      ("a", None), ("b", Some(9L))).toDF("g", "v")
    val out = Profile.distinctKmv(df, Seq("g"), "v", k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
    assert(out.toSeq == Seq(("a", 2L, 2L), ("b", 1L, 1L)))
  }

  test("estimator lands within the KMV error bound on uniform-ish data") {
    import spark.implicits._
    // std error ≈ 1/√(k−2) ≈ 12.7% at k=64; assert a 3-sigma-ish bound.
    // Values are short decimal strings — exactly the short-string case
    // the affine mixing exists for (the raw polynomial fold's order
    // statistics would be off by 10⁴×)
    for (n <- Seq(200L, 2000L, 20000L)) {
      val df = (1L to n).map(i => ("g", i * 7 + 13)).toDF("g", "v")
      val est = Profile.distinctKmv(df, Seq("g"), "v", k = 64)
        .collect().head.getLong(3)
      assert(math.abs(est - n).toDouble / n <= 0.4,
        s"estimate $est too far from true $n")
    }
  }

  test("sketches merge by union: merge(parts) == sketch(whole)") {
    import spark.implicits._
    val whole = (1L to 3000L).map(i => (s"g${i % 3}", i)).toDF("g", "v")
    val p1 = whole.filter(col("v") % 2 === 0)
    val p2 = whole.filter(col("v") % 2 =!= 0)
    // overlap: p2 also re-contains some of p1's values (union semantics)
    val p2dup = p2.union(whole.filter(col("v") % 10 === 0))
    val k = 32
    val direct = Profile.distinctKmvSketch(whole, Seq("g"), "v", k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val merged = Profile.kmvMerge(
        Profile.distinctKmvSketch(p1, Seq("g"), "v", k)
          .union(Profile.distinctKmvSketch(p2dup, Seq("g"), "v", k)),
        Seq("g"), k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged == direct)
    // and estimates computed off merged sketches equal the direct ones
    val eDirect = Profile.kmvEstimate(
      Profile.distinctKmvSketch(whole, Seq("g"), "v", k), Seq("g"), k)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSet
    val eMerged = Profile.kmvEstimate(Profile.kmvMerge(
      Profile.distinctKmvSketch(p1, Seq("g"), "v", k)
        .union(Profile.distinctKmvSketch(p2dup, Seq("g"), "v", k)), Seq("g"), k),
      Seq("g"), k)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSet
    assert(eMerged == eDirect)
  }

  test("kmvHash spreads short strings across the full range") {
    import spark.implicits._
    val hs = (1L to 1000L).map(i => Tuple1(i)).toDF("v")
      .select(TextFunctions.kmvHash(col("v").cast("string")).as("h"))
      .collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0 && h < R))
    // min of 1000 uniform draws from [0,R) is ≈ R/1000; the raw
    // polynomial fold would put EVERY value below ~10¹⁶
    assert(hs.max > R / 2, "top of range never reached — not uniform")
    assert(hs.count(_ < R / 2).toDouble / hs.length > 0.35)
    assert(hs.count(_ >= R / 2).toDouble / hs.length > 0.35)
  }

  test("plan: both aggregations are k-bounded partials, no window") {
    val df = Profile.distinctKmv(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"),
      Seq("event_type"), "user_id", k = 64)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_topk"), s"no map-side partial top-k:\n$p")
    assert(!p.contains("Window"), s"window in sketch plan:\n$p")
  }
}
