package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

/** Diagnostic: run one SparkEntry query warm and report how many Spark
  * JOBS it launches, with per-job wall time and stage/task counts —
  * the measurement that separates "slow because of data volume" from
  * "slow because of action count" (each driver-side job launch costs a
  * fixed ~40-120 ms at bench scale, so a query that fires 15 jobs pays
  * ~1 s before a single byte is processed).
  *
  * Usage: runMain graft.ProbeJobs <query> [reps]
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ProbeJobs <query> [reps]"))
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_MIN_PARTITION_SIZE").foreach(v =>
      b.config("spark.sql.adaptive.coalescePartitions.minPartitionSize", v))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    final case class JobRec(start: Long, var end: Long, var stages: Int, var tasks: Int)
    final case class StageRec(name: String, tasks: Int, wallMs: Long, taskMs: Long)
    val jobs = TrieMap[Int, JobRec]()
    val stages = TrieMap[Int, StageRec]()
    val taskCount = new AtomicLong(0)
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, JobRec(e.time, 0L, e.stageInfos.size, 0))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val s = e.stageInfo
        val wall = (for (a <- s.submissionTime; b <- s.completionTime) yield b - a).getOrElse(0L)
        stages.put(s.stageId,
          StageRec(s.name.takeWhile(_ != '\n').take(90), s.numTasks, wall,
            s.taskMetrics.executorRunTime))
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        taskCount.incrementAndGet(); ()
      }
    }
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warmup rep — not measured
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { i =>
      jobs.clear(); stages.clear(); taskCount.set(0)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = System.nanoTime()
      val plan = df.queryExecution.executedPlan // analysis + optimization + physical planning
      val tPlan = System.nanoTime()
      val n = df.count()
      val el = (System.nanoTime() - t0) / 1e9
      println(f"[probejobs]   build ${(tBuild - t0) / 1e9}%.3f s  plan ${(tPlan - tBuild) / 1e9}%.3f s  exec ${(System.nanoTime() - tPlan) / 1e9}%.3f s")
      Thread.sleep(400) // let the listener bus drain
      val js = jobs.toSeq.sortBy(_._1)
      val jobWall = js.map(j => (j._2.end - j._2.start).max(0L)).sum / 1e3
      println(f"[probejobs] $name rep $i: $el%.3f s, ${js.size} jobs " +
        f"(sum job wall $jobWall%.3f s), ${js.map(_._2.stages).sum} stages, " +
        f"${taskCount.get} tasks, $n rows")
      js.foreach { case (id, r) =>
        println(f"[probejobs]   job $id%3d  ${(r.end - r.start).max(0L) / 1e3}%7.3f s  ${r.stages}%2d stages")
      }
      stages.toSeq.sortBy(-_._2.wallMs).take(8).foreach { case (sid, s) =>
        println(f"[probejobs]   stage $sid%3d  wall ${s.wallMs / 1e3}%7.3f s  task ${s.taskMs / 1e3}%7.3f s  ${s.tasks}%3d tasks  ${s.name}")
      }
    }
    spark.stop()
  }
}
