package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("salted join returns exactly the plain join result") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name")

    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name")
    val salted = Skew.saltedJoin(orders, customer,
        col("o_custkey") === col("c_custkey"), n = 8)
      .select("o_orderkey", "c_name")

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt is deterministic and spreads a hot key over n partitions") {
    import spark.implicits._
    // 1000 rows of one hot key + distinct payloads
    val hot = (1 to 1000).map(i => (42L, s"p$i")).toDF("k", "payload")
    val s1 = Skew.salt(hot, 8).select("payload", "__salt")
    val s2 = Skew.salt(hot, 8).select("payload", "__salt")
    // deterministic: same salt on re-computation
    assert(s1.exceptAll(s2).isEmpty)
    // spread: all 8 salt values used, no value holds > 1/4 of the rows
    val dist = s1.groupBy("__salt").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(dist.size == 8, s"salts used: ${dist.keySet}")
    assert(dist.values.max <= 250, s"skewed salt distribution: $dist")
  }

  test("hotKeys isolates only over-threshold keys") {
    import spark.implicits._
    val df = ((1 to 100).map(_ => 1L) ++ Seq(2L, 3L)).toDF("k")
    val hot = Skew.hotKeys(df, "k", threshold = 10L).as[Long].collect().toList
    assert(hot == List(1L))
  }
}
