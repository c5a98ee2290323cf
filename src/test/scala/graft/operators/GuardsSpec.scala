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

  test("ANN query-side broadcast is guarded: an oversized query set fails loudly") {
    import org.apache.spark.sql.functions._
    // 100001 one-dim vectors — one past the ANN broadcast contract
    val big = spark.range(100001L).toDF("vec_id")
      .withColumn("embedding", array(lit(1.0f)))
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(big, big, "vec_id", "embedding", k = 2).collect()
    }
    assert(e.getMessage.contains("bruteForceTopK query set"), e.getMessage)
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
