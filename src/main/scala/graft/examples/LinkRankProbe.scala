package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone replica of ScaleDecade's host-graph PageRank probe
  * (`runMain graft.examples.LinkRankProbe [maxN]`) — same synthesis,
  * same parameters — so LinkRank execution changes can be measured at
  * 10⁴→10⁶ hosts without re-running the whole decade. Measurement
  * tool, not part of the driver contract.
  */
object LinkRankProbe {
  def main(args: Array[String]): Unit = {
    val maxN = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (n <- Seq(10000L, 100000L, 1000000L).filter(_ <= maxN)) {
      val organic = spark.range(n * 8).selectExpr(
        s"concat('h', id div 8) AS src",
        s"concat('h', (id * 2654435761) % $n) AS dst")
      val hub = spark.range(n / 10).selectExpr(
        "'hub.example' AS src", s"concat('h', id % $n) AS dst")
      val e = organic.unionByName(hub)
        .repartition(spark.sparkContext.defaultParallelism).localCheckpoint(true)
      val t0 = System.nanoTime()
      val ranks = graft.operators.LinkRank.hostRank(e, iterations = 3, maxOutDegree = 16)
      val built = (System.nanoTime() - t0) / 1e9
      val rows = ranks.count()
      val hubDeg = ranks.where(col("host") === "hub.example")
        .select("outdeg").collect()(0).getLong(0)
      println(f"[lrprobe] hosts=$n%8d rank3iters=$built%7.2f s ($rows%8d hosts, hub outdeg=$hubDeg)")
      ranks.unpersist(); e.unpersist()
    }
    spark.stop()
  }
}
