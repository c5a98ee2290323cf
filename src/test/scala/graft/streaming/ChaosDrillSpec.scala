package graft.streaming

import java.nio.file.{Files, Path}

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkSpec
import graft.pipeline.Registry
import graft.sinks.{IdempotentParquetSink, Sink}

/** The full-app chaos drill: every control-plane subsystem COMPOSED
  * under an ungraceful mid-stream driver crash, not tested one at a
  * time (reference analog: `inttest/integration_test.go:125-212` +
  * `executor/message_int_test.go`, which prove the Go executor against
  * a real Kafka/ZK by killing and restarting instances).
  *
  * Scenario: instance A (leader, metrics server up, async RPC node in
  * the tree, one recovery request pending on the control bus) crashes
  * INSIDE a sink write — after the parquet landed, before the epoch
  * committed, with no resign and no ack. Instance B starts on a fresh
  * SparkSession against the SAME checkpoint / control bus / leader
  * dir / results dir and must: take over leadership after TTL expiry,
  * re-receive the unacked recovery request from the bus replay,
  * re-deliver the crashed micro-batch WITHOUT duplicating its rows
  * (batch-id idempotent sink), drain the remaining input, run the
  * bounded recovery replay to completion, and ack it so a third
  * incarnation sees a clean control plane.
  */
class ChaosDrillSpec extends SparkSpec {

  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  /** md5 hex, what asyncrpcnode emits for an "ok" payload. */
  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** crash AFTER the inner idempotent write, BEFORE Spark commits the
    * epoch — the worst-ordered sink failure — once, when armed.
    */
  private final class CrashOnceSink(inner: Sink, armFlag: Path) extends Sink {
    @volatile private var tripped = false
    def writeBatch(df: DataFrame): Unit = writeBatch(df, 0L)
    override def writeBatch(df: DataFrame, batchId: Long): Unit = {
      inner.writeBatch(df, batchId)
      if (!tripped && Files.exists(armFlag)) {
        tripped = true
        throw new RuntimeException("injected sink crash (post-write, pre-commit)")
      }
    }
  }

  private def yaml(topic: String): String =
    s"""application: $topic
       |source:
       |  name: stringsource
       |  params:
       |    path: unused
       |    topic: $topic
       |    maxpartitionlag: "100"
       |    parallelrecoverymaxrecords: "500"
       |    parallelrecoverymaxrate: "500"
       |nodes:
       |  - name: filternode
       |    children:
       |      - name: asyncrpcnode
       |        error_handler:
       |          name: errorhandlernode
       |        children:
       |          - name: resultsnode
       |""".stripMargin

  private def fileSource(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema("v STRING").parquet(dir)
      .select(col("v").as("payload"), lit(ts).as("created"), lit(false).as("recovery"))

  test("driver crash mid-batch: takeover, redelivery without duplicates, recovery completion") {
    val s = spark
    import s.implicits._

    val root = Files.createTempDirectory("chaos-drill")
    val srcDir = s"$root/in"
    val cp = s"$root/checkpoint"
    val resultsDir = s"$root/results"
    val dlqDir = s"$root/dlq"
    val busPath = root.resolve("control.jsonl")
    val leaderDir = root.resolve("leader")
    val crashFlag = root.resolve("arm-crash")
    val Topic = "chaos"

    def wave(tag: String, n: Int): Seq[String] =
      (1 to n).map { i =>
        if (i % 10 == 0) s"error $tag-$i"
        else if (i % 7 == 0) s"filterme $tag-$i"
        else s"ok $tag-$i"
      }
    def okMd5(rows: Seq[String]): Seq[String] =
      rows.filter(_.startsWith("ok")).map(md5).sorted

    // a prior incarnation recorded a gap on partition 0 and died
    // before replaying it — the request sits unacked on the bus
    new FileMessageBus(busPath).send(BusMessage("recoveryrequest", "0",
      """{"partitionId":0,"fromOffset":100,"toOffset":300}""".getBytes("UTF-8")))

    // shared manual clock: the drill, not wall time, decides when the
    // dead leader's heartbeats go stale
    @volatile var now = 1000L

    // ---- instance A: leader, metrics up, processing live data ----
    val busA = new FileMessageBus(busPath)
    val appA = GraftApp.fromYaml(s, yaml(Topic), Registry.builtins(), Some(busA))
      .fold(e => fail(s"config rejected: $e"), identity)
    val electionA = new LeaderElection(leaderDir, "instance-a", ttlMs = 100, () => now)
    electionA.start()
    appA.ctx.configureLeader(() => electionA.isLeader)
    assert(appA.ctx.isLeader, "first instance must lead")
    assert(appA.recovery.exists(_.pendingCount == 1),
      "bus replay must deliver the unacked recovery request before execution")

    val metricsA = new PipelineMetrics(s).install()
    val serverA = new MetricsServer(s, metricsA).start()
    val resultsA = new CrashOnceSink(new IdempotentParquetSink(resultsDir), crashFlag)
    val dlqA = new IdempotentParquetSink(dlqDir)

    val wave1 = wave("w1", 40)
    wave1.toDF("v").write.mode("append").parquet(srcDir)
    val runA = appA.execute(fileSource(s, srcDir),
      Map("resultsnode" -> resultsA), Map("asyncrpcnode" -> dlqA),
      checkpoint = Some(cp), trigger = Trigger.ProcessingTime(0L))
    runA.query.processAllAvailable()

    // live scrape while A runs: reference-named counters are visible
    val scrape = {
      val url = new java.net.URI(s"http://localhost:${serverA.boundPort}/metrics").toURL
      val in = url.openStream()
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    assert(scrape.contains("node_received_events_total"), s"missing counter in:\n$scrape")

    // ---- the crash: wave 2 lands, the sink dies post-write ----
    Files.createFile(crashFlag)
    val wave2 = wave("w2", 25)
    wave2.toDF("v").write.mode("append").parquet(srcDir)
    val ex = intercept[StreamingQueryException] { runA.query.processAllAvailable() }
    assert(ex.getMessage.contains("injected sink crash") ||
      Option(ex.getCause).exists(_.getMessage.contains("injected sink crash")))
    // A is DEAD: no shutdown, no resign, no recovery ack. Its metrics
    // server would die with the process — stop it as the harness's
    // stand-in for that.
    serverA.stop(); metricsA.uninstall()
    Files.delete(crashFlag)

    // ---- instance B: new session, same checkpoint/bus/leader dir ----
    val s2 = s.newSession()
    val electionB = new LeaderElection(leaderDir, "instance-b", ttlMs = 100, () => now)
    electionB.start()
    assert(!electionB.isLeader, "B must follow while A's heartbeat is fresh")
    now += 500 // A misses every heartbeat past its ttl
    electionB.heartbeat()
    assert(electionB.isLeader, "B must take over after A's heartbeat expires")

    val busB = new FileMessageBus(busPath)
    val appB = GraftApp.fromYaml(s2, yaml(Topic), Registry.builtins(), Some(busB))
      .fold(e => fail(s"config rejected: $e"), identity)
    appB.ctx.configureLeader(() => electionB.isLeader)
    assert(appB.ctx.isLeader)
    val recB = appB.recovery.getOrElse(fail("recovery not configured"))
    assert(recB.pendingCount == 1, "crashed instance's unacked request must redeliver")

    val metricsB = new PipelineMetrics(s2).install()
    try {
      // same sinks minus the fault injector; same dirs, same checkpoint
      val runB = appB.execute(fileSource(s2, srcDir),
        Map("resultsnode" -> new IdempotentParquetSink(resultsDir)),
        Map("asyncrpcnode" -> new IdempotentParquetSink(dlqDir)),
        checkpoint = Some(cp), trigger = Trigger.ProcessingTime(0L))
      runB.query.processAllAvailable()

      // wave 3 proves B keeps consuming beyond the redelivery
      val wave3 = wave("w3", 15)
      wave3.toDF("v").write.mode("append").parquet(srcDir)
      runB.query.processAllAvailable()
      appB.shutdown()

      // ---- EXACTLY-ONCE: every ok payload appears exactly once even
      // though the crashed batch was written once by A and re-delivered
      // to B; same for dead letters ----
      val got = s2.read.parquet(resultsDir).select("payload")
        .as[String].collect().sorted.toSeq
      assert(got == okMd5(wave1 ++ wave2 ++ wave3),
        s"results not exactly-once: ${got.length} rows")
      // dead-letter frames carry the reference's error-document shape:
      // payload = struct(timestamp, event, error(code, message))
      val deadLetters = s2.read.parquet(dlqDir)
        .select(col("payload.event")).as[String].collect().sorted.toSeq
      assert(deadLetters == (wave1 ++ wave2 ++ wave3).filter(_.startsWith("error")).sorted,
        s"dead letters not exactly-once: $deadLetters")

      // ---- bounded recovery replay on B, to completion + ack ----
      val spec = recB.replaySpec(assigned = Set(0), triggerIntervalMs = 1000L)
        .getOrElse(fail("no pending replay"))
      assert(spec.startingOffsetsJson == OffsetMath.offsetsJson(Topic, Map(0 -> 100L)))
      assert(spec.endingOffsetsJson == OffsetMath.offsetsJson(Topic, Map(0 -> 300L)))
      val recResults = new IdempotentParquetSink(s"$root/rec-results")
      val replay = MemoryStream[String](s2)
      val replaySrc = replay.toDF().select(col("value").as("payload"),
        lit(ts).as("created"), lit(true).as("recovery"))
      val runRec = appB.execute(replaySrc,
        Map("resultsnode" -> recResults), Map("asyncrpcnode" -> new IdempotentParquetSink(s"$root/rec-dlq")),
        trigger = Trigger.ProcessingTime(0L))
      val recRows = (100L until 300L).map(o => s"ok rec-$o")
      replay.addData(recRows)
      runRec.query.processAllAvailable()
      appB.shutdown()
      recB.complete(0, 300L)
      assert(recB.pendingCount == 0)
      val recGot = s2.read.parquet(s"$root/rec-results")
      assert(recGot.count() == 200 &&
        recGot.select("recovery").as[Boolean].collect().forall(identity),
        "recovered rows must be tagged recovery=true")

      // ---- a third incarnation sees a clean control plane ----
      val redelivered = ListBuffer[BusMessage]()
      val busC = new FileMessageBus(busPath)
      busC.subscribe(Seq("recoveryrequest"), redelivered += _)
      busC.start()
      assert(redelivered.isEmpty, "completed recovery must not replay to a fresh instance")

      // metrics on B counted the redelivered and new batches. The async
      // node's `received` sits just below its exactly-once checkpoint
      // (Pipeline.buildNode ordering) and counts every row the crashed
      // batch re-delivered: w2 22 (25 minus 3 filtered upstream) +
      // w3 13 + recovery 200 = 235. Counters ABOVE the checkpoint
      // break (filternode's) are structurally unobservable for an
      // async subtree — the async node's own received IS the parent's
      // emitted (1:1 pre). Events arrive on async listener buses: wait.
      val deadline = System.currentTimeMillis() + 10000
      while (metricsB.nodeCounts("asyncrpcnode")._1 < 235 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(metricsB.nodeCounts("asyncrpcnode")._1 == 235,
        s"async received mismatch; snapshot=${metricsB.snapshot}")
      assert(metricsB.nodeCounts("resultsnode")._1 > 0)
    } finally {
      appB.shutdown()
      metricsB.uninstall()
      electionB.shutdown()
    }
  }
}
