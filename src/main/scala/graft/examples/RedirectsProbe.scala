package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone replica of ScaleDecade's redirect-resolution probe
  * (`runMain graft.examples.RedirectsProbe`) — same synthesis, same
  * parameters — so [[graft.operators.Redirects]] changes can be
  * measured without re-running the whole decade. Measurement tool,
  * not part of the driver contract.
  */
object RedirectsProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(f: => Long): (Double, Long) = {
      var n = 0L
      val w = { val t0 = System.nanoTime(); n = f; (System.nanoTime() - t0) / 1e9 }
      val t0 = System.nanoTime(); f
      (math.min(w, (System.nanoTime() - t0) / 1e9), n)
    }
    for (m <- Seq(1, 8, 64)) {
      val nSrc = 20000L * m
      val groups = nSrc / 8
      val ed = spark.range(nSrc).selectExpr(
        "concat('u', id div 8, '_', id % 8 + 1) AS src",
        "CASE WHEN id % 8 = 0 THEN concat('t', id div 8) " +
          "ELSE concat('u', id div 8, '_', id % 8) END AS dst")
        .unionByName(spark.range(groups / 50).selectExpr(
          "concat('c', id, '_x') AS src", "concat('c', id, '_y') AS dst"))
        .unionByName(spark.range(groups / 50).selectExpr(
          "concat('c', id, '_y') AS src", "concat('c', id, '_x') AS dst"))
        .repartition(spark.sparkContext.defaultParallelism).localCheckpoint(true)
      val (t, n) = time(graft.operators.Redirects.resolve(ed, rounds = 4)
        .where(col("terminal")).count())
      println(f"[rdprobe] ${m}%2dx edges=${nSrc + 2 * (groups / 50)}%8d " +
        f"resolve=$t%7.2f s ($n%8d terminal of ${nSrc + 2 * (groups / 50)}%8d)")
      ed.unpersist()
    }
    spark.stop()
  }
}
