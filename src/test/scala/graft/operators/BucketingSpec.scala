package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The point of bucketing is the plan: a join of two tables bucketed on
  * the join key must run with ZERO Exchange operators (both sides
  * already partitioned by the key on disk), versus two for the plain
  * parquet join.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables has no shuffle; plain join has two") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")

    // broadcast would bypass the comparison — force shuffle-based joins
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      val plainShuffles = "Exchange hashpartitioning".r
        .findAllIn(plain.queryExecution.executedPlan.toString).size
      assert(plainShuffles == 2, s"expected 2 shuffles in plain join, got $plainShuffles")

      Bucketing.writeBucketed(orders, "orders_b", Seq("o_orderkey"), 4, Seq("o_orderkey"))
      Bucketing.writeBucketed(lineitem, "lineitem_b", Seq("l_orderkey"), 4, Seq("l_orderkey"))
      val bucketed = Bucketing.read(spark, "orders_b")
        .join(Bucketing.read(spark, "lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      val p = bucketed.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$p")

      // same rows either way
      assert(bucketed.count() == plain.count())

      // groupBy on the bucket key also skips its shuffle
      val agg = Bucketing.read(spark, "lineitem_b")
        .groupBy("l_orderkey").agg(sum("l_quantity"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
