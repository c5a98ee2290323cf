package graft.operators

import graft.SparkSpec

/** The broadcast guard must fail LOUDLY when a small-by-contract side
  * outgrows its limit — a silently-huge probe set broadcast into a
  * replicated join is a cluster-killer that looks like a slow day.
  */
class GuardsSpec extends SparkSpec {

  test("assertBroadcastable passes small frames through unchanged") {
    val s = spark
    import s.implicits._
    val df = (1L to 50L).toDF("id")
    assert(Guards.assertBroadcastable(df, maxRows = 50L, "probe set").count() == 50L)
  }

  test("assertBroadcastable fails loudly past the limit, naming the contract") {
    val s = spark
    import s.implicits._
    val df = (1L to 51L).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Guards.assertBroadcastable(df, maxRows = 50L, "fuzzy-match probe set")
    }
    assert(e.getMessage.contains("fuzzy-match probe set"), e.getMessage)
    assert(e.getMessage.contains("50"), e.getMessage)
  }

  test("the guard job itself is bounded: it never counts past maxRows + 1") {
    val s = spark
    import s.implicits._
    // a frame of 10M rows must guard in bounded time via limit pushdown
    val big = spark.range(10000000L).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Guards.assertBroadcastable(big, maxRows = 10L, "huge probe set")
    }
    assert(e.getMessage.contains("huge probe set"), e.getMessage)
  }
}
