package graft
import org.apache.spark.sql.SparkSession

/** Capture `.explain("formatted")` for a list of SparkEntry queries
  * into files — the plan-evidence tool for optimization rounds:
  * `runMain graft.ExplainMany <outDir> <suffix> <q1> <q2> ...`
  * writes `<outDir>/<query>_<suffix>.txt` for each query. Queries are
  * materialized first (count) so AQE-finalized plans and any
  * construction-time snapshots reflect what the bench actually runs.
  */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainMany <outDir> <suffix> <queries...>")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.count() // materialize so AQE finalizes stages
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
        println(s"[explainmany] wrote $name")
      } catch {
        case t: Throwable => System.err.println(s"[explainmany] $name FAILED: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
