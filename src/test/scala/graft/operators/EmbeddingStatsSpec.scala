package graft.operators

import graft.SparkSpec

/** Embedding-table quality gate: every degenerate class is counted
  * once, disjointly from n_ok.
  */
class EmbeddingStatsSpec extends SparkSpec {

  import spark.implicits._

  test("counts every degenerate class and the healthy remainder") {
    val df = Seq(
      (1L, Seq(1f, 2f, 3f)),                    // ok
      (2L, Seq(1f, 2f)),                        // wrong dim
      (3L, Seq(Float.NaN, 1f, 2f)),             // nan
      (4L, Seq(0f, 0f, 0f)),                    // zero
      (5L, null.asInstanceOf[Seq[Float]]),      // null
      (6L, Seq(4f, 5f, 6f))                     // ok
    ).toDF("id", "vec")
    val r = Profile.embeddingStats(df, "vec", expectedDim = 3).collect().head
    assert(r.getLong(0) == 6L)   // n_rows
    assert(r.getLong(1) == 1L)   // n_null
    assert(r.getLong(2) == 1L)   // n_wrong_dim
    assert(r.getLong(3) == 1L)   // n_nan
    assert(r.getLong(4) == 1L)   // n_zero
    assert(r.getLong(5) == 2L)   // n_ok
  }

  test("a NaN-bearing vector is not miscounted as zero") {
    val df = Seq((1L, Seq(Float.NaN, 0f, 0f))).toDF("id", "vec")
    val r = Profile.embeddingStats(df, "vec", 3).collect().head
    assert(r.getLong(3) == 1L && r.getLong(4) == 0L && r.getLong(5) == 0L)
  }

  test("a NULL element counts as n_nan, not in no category (3VL trap)") {
    // exists(isnan) over [1.0, null, 2.0] is NULL under three-valued
    // logic — the vector must land in n_nan (null elements poison
    // cosines like NaN), and a [null, 0] vector must NOT count as zero
    val df = Seq(
      (1L, Seq[java.lang.Float](1f, null, 2f)),
      (2L, Seq[java.lang.Float](null, 0f, 0f)),
      (3L, Seq[java.lang.Float](1f, 2f, 3f))
    ).toDF("id", "vec")
    val r = Profile.embeddingStats(df, "vec", 3).collect().head
    assert(r.getLong(0) == 3L) // n_rows
    assert(r.getLong(3) == 2L, s"null-element vectors must count as n_nan: $r")
    assert(r.getLong(4) == 0L) // n_zero: [null,0,0] is not definitively zero
    assert(r.getLong(5) == 1L) // only the clean vector is ok
    // every row is accounted for: nan + ok == rows here
    assert(r.getLong(3) + r.getLong(5) == r.getLong(0))
  }

  test("clean corpus gates fully ok in one job") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = Profile.embeddingStats(df, "embedding", 64).collect().head
    assert(r.getLong(0) == r.getLong(5), "clean corpus should be all-ok")
  }
}
