package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.config.AppConfig
import graft.pipeline.Registry
import graft.sinks.CollectingSink

/** End-to-end streaming run of the reference's deterministic 10/5/3
  * mix through the full config tree — the Structured Streaming analog
  * of `executor/executor_test.go:23-80` / `inttest/integration_test.go`
  * exact-count assertions.
  */
class StreamingPipelineSpec extends SparkSpec {

  test("streaming pipeline routes success/filtered/error with exact counts") {
    val s = spark
    import s.implicits._

    val reg = Registry.builtins()
    val cfg = AppConfig.parse(
      """application: streamtest
        |source:
        |  name: stringsource
        |  params: {path: unused}
        |nodes:
        |  - name: filternode
        |    children:
        |      - name: errornode
        |        error_handler:
        |          name: errorhandlernode
        |        children:
        |          - name: resultsnode
        |""".stripMargin, reg).fold(e => sys.error(e), identity)

    val input = MemoryStream[String](s)
    val source = input.toDF().select(
      col("value").as("payload"),
      lit(Timestamp.valueOf("2024-01-01 00:00:00")).as("created"),
      lit(false).as("recovery"))

    val results = new CollectingSink
    val deadLetters = new CollectingSink
    val running = StreamingPipeline.run(
      source, cfg, reg,
      sinks = Map("resultsnode" -> results),
      deadLetterSinks = Map("errornode" -> deadLetters),
      trigger = Trigger.ProcessingTime(0L))

    try {
      input.addData((1 to 10).map(i => s"success $i"))
      input.addData((1 to 5).map(i => s"filterme $i"))
      input.addData((1 to 3).map(i => s"error $i"))
      running.query.processAllAvailable()

      assert(results.rows.size == 10)
      assert(deadLetters.rows.size == 3)
      val codes = deadLetters.rows.map(_.getStruct(0).getStruct(2).getString(0)).toSet
      assert(codes == Set("ERR_TEST"))

      // second wave: streaming keeps consuming (supervision is Spark's)
      input.addData(Seq("success again", "filterme again"))
      running.query.processAllAvailable()
      assert(results.rows.size == 11)
    } finally running.shutdown()
  }

  test("async RPC node streams: per-batch pool lifecycle, outcomes routed per micro-batch") {
    val s = spark
    import s.implicits._
    val reg = Registry.builtins()
    val cfg = AppConfig.parse(
      """application: asyncstream
        |source:
        |  name: stringsource
        |  params: {path: unused}
        |nodes:
        |  - name: asyncrpcnode
        |    params:
        |      error_prefix: error
        |      filter_prefix: filterme
        |      max_in_flight: 4
        |      latency_ms: 1
        |    error_handler:
        |      name: errorhandlernode
        |    children:
        |      - name: resultsnode
        |""".stripMargin, reg).fold(e => sys.error(e), identity)
    val input = MemoryStream[String](s)
    val source = input.toDF().select(
      col("value").as("payload"),
      lit(Timestamp.valueOf("2024-01-01 00:00:00")).as("created"),
      lit(false).as("recovery"))
    val results = new CollectingSink
    val deadLetters = new CollectingSink
    val running = StreamingPipeline.run(
      source, cfg, reg,
      sinks = Map("resultsnode" -> results),
      deadLetterSinks = Map("asyncrpcnode" -> deadLetters),
      trigger = Trigger.ProcessingTime(0L))
    try {
      input.addData((1 to 8).map(i => s"success $i") ++ Seq("error 1", "filterme 1"))
      running.query.processAllAvailable()
      assert(results.rows.size == 8)
      assert(results.rows.forall(_.getString(0).matches("[0-9a-f]{32}"))) // RPC result
      assert(deadLetters.rows.size == 1)
      assert(deadLetters.rows.head.getStruct(0).getStruct(2).getString(0) == "ERR_ASYNC")
      // a second micro-batch gets a fresh pool — no exhausted-executor carryover
      input.addData(Seq("success again", "error again"))
      running.query.processAllAvailable()
      assert(results.rows.size == 9 && deadLetters.rows.size == 2)
    } finally running.shutdown()
  }

  test("chunker node fans documents into chunk events over a stream") {
    val s = spark
    import s.implicits._

    val reg = Registry.builtins()
    val cfg = AppConfig.parse(
      """application: chunkstream
        |source:
        |  name: stringsource
        |  params: {path: unused}
        |nodes:
        |  - name: chunker
        |    params: {chunk_size: "4", overlap: "1"}
        |    children:
        |      - name: resultsnode
        |""".stripMargin, reg).fold(e => sys.error(e), identity)

    val input = MemoryStream[String](s)
    val source = input.toDF().select(
      col("value").as("payload"),
      lit(Timestamp.valueOf("2024-01-01 00:00:00")).as("created"),
      lit(false).as("recovery"))
    val results = new CollectingSink
    val running = StreamingPipeline.run(
      source, cfg, reg,
      sinks = Map("resultsnode" -> results),
      deadLetterSinks = Map.empty,
      trigger = Trigger.ProcessingTime(0L))
    try {
      // 6 tokens, size 4, stride 3 → 2 chunks; 3 tokens → 1 chunk
      input.addData(Seq("one two three four five six", "a b c"))
      running.query.processAllAvailable()
      assert(results.rows.size == 3)
      val texts = results.rows.map(_.getString(0)).toSet
      assert(texts == Set("one two three four", "four five six", "a b c"))
    } finally running.shutdown()
  }

  test("event-time tumbling window with watermark aggregates a stream") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(Timestamp, Double)](s)
    val df = input.toDF().toDF("ts", "value")
    val agg = EventTime.tumbling(df, "ts", "10 minutes", watermarkDelay = Some("20 minutes"))
      .agg(count(lit(1)).as("n"), sum("value").as("s"))

    val sinkName = "evtwin"
    val q = agg.writeStream.format("memory").queryName(sinkName)
      .outputMode("update").trigger(Trigger.ProcessingTime(0L)).start()
    try {
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      input.addData(Seq((t(1), 1.0), (t(2), 2.0), (t(11), 10.0)))
      q.processAllAvailable()
      val rows = s.sql(s"SELECT window.start, n, s FROM $sinkName").collect()
      val m = rows.map(r => r.getTimestamp(0).toString -> (r.getLong(1), r.getDouble(2))).toMap
      assert(m("2024-01-01 10:00:00.0") == (2L, 3.0))
      assert(m("2024-01-01 10:10:00.0") == (1L, 10.0))
    } finally q.stop()
  }

  test("pipeline metrics observed via listener") {
    val s = spark
    val metrics = new PipelineMetrics(s).install()
    try {
      import s.implicits._
      val reg = Registry.builtins()
      val cfg = AppConfig.parse(
        """application: metricstest
          |source:
          |  name: stringsource
          |  params: {path: unused}
          |nodes:
          |  - name: filternode
          |""".stripMargin, reg).fold(e => sys.error(e), identity)
      val mix = ((1 to 10).map(i => s"success $i") ++ (1 to 5).map(i => s"filterme $i"))
        .toDF("payload")
        .select(col("payload"), current_timestamp().as("created"), lit(false).as("recovery"))
      val built = graft.pipeline.Pipeline.buildOn(mix, cfg.nodes, reg,
        observeMetrics = true, persistShared = false)
      built.roots.head.output.collect() // action triggers listener
      // listener callbacks are async — poll for arrival
      val deadline = System.currentTimeMillis() + 10000
      while (metrics.nodeCounts("filternode")._1 == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val (received, emitted) = metrics.nodeCounts("filternode")
      assert(received == 15 && emitted == 10)
    } finally metrics.uninstall()
  }

  test("discard_on_full_buffer sheds per partition and counts discards") {
    val s = spark
    val metrics = new PipelineMetrics(s).install()
    try {
      import s.implicits._
      val reg = Registry.builtins()
      val cfg = AppConfig.parse(
        """application: shedtest
          |source:
          |  name: stringsource
          |  params: {path: unused}
          |nodes:
          |  - name: filternode
          |    children:
          |      - name: resultsnode
          |        buffersize: 7
          |        discard_on_full_buffer: true
          |""".stripMargin, reg).fold(e => sys.error(e), identity)
      // single partition → one bounded channel of 7: the pre-r11 cap
      // semantics exactly
      val mix = ((1 to 20).map(i => s"success $i") ++ (1 to 5).map(i => s"filterme $i"))
        .toDF("payload")
        .select(col("payload"), current_timestamp().as("created"), lit(false).as("recovery"))
        .repartition(1)
      val built = graft.pipeline.Pipeline.buildOn(mix, cfg.nodes, reg,
        observeMetrics = true, persistShared = false)
      val out = built.find("resultsnode").get.output.collect()
      assert(out.length == 7, s"expected the cap, got ${out.length}")
      // survivors are real upstream rows, not fabricated
      assert(out.map(_.getString(0)).forall(_.startsWith("success")))
      val deadline = System.currentTimeMillis() + 10000
      while (metrics.nodeCounts("resultsnode")._1 == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(metrics.nodeCounts("resultsnode") == ((7L, 7L)))
      assert(metrics.discardedEvents("resultsnode") == 13L) // 20 offered - 7 admitted
      assert(metrics.discardedEvents("filternode") == 0L)   // unflagged node sheds nothing
    } finally metrics.uninstall()
  }

  test("discard_on_full_buffer capacity scales with workers (one channel per task)") {
    val s = spark
    import s.implicits._
    val reg = Registry.builtins()
    val cfg = AppConfig.parse(
      """application: shedtest
        |source:
        |  name: stringsource
        |  params: {path: unused}
        |nodes:
        |  - name: filternode
        |    children:
        |      - name: resultsnode
        |        workers: 3
        |        buffersize: 5
        |        discard_on_full_buffer: true
        |""".stripMargin, reg).fold(e => sys.error(e), identity)
    // 60 surviving rows from 1 partition, workers floor → 3 round-robin
    // partitions of 20 each, each channel admits 5 → exactly 15 kept
    val mix = (1 to 60).map(i => s"success $i").toDF("payload")
      .select(col("payload"), current_timestamp().as("created"), lit(false).as("recovery"))
      .repartition(1)
    val built = graft.pipeline.Pipeline.buildOn(mix, cfg.nodes, reg,
      observeMetrics = false, persistShared = false)
    val out = built.find("resultsnode").get.output
    assert(out.rdd.getNumPartitions == 3, "shed must not collapse parallelism")
    val perPart = out.rdd.mapPartitions(it => Iterator.single(it.size)).collect().toSeq
    assert(perPart == Seq(5, 5, 5), s"per-channel admission violated: $perPart")
  }

  test("discard_on_full_buffer capacity is workers x buffersize even when the input plans WIDER") {
    // an input already at 8 partitions (a multi-split scan at corpus
    // scale) must still shed at exactly workers x buffersize — the
    // round-11 review caught the floor-only repartition letting the
    // capacity silently become buffersize x split-count
    val s = spark
    import s.implicits._
    val reg = Registry.builtins()
    val cfg = AppConfig.parse(
      """application: shedtest
        |source:
        |  name: stringsource
        |  params: {path: unused}
        |nodes:
        |  - name: filternode
        |    children:
        |      - name: resultsnode
        |        workers: 3
        |        buffersize: 5
        |        discard_on_full_buffer: true
        |""".stripMargin, reg).fold(e => sys.error(e), identity)
    val mix = (1 to 60).map(i => s"success $i").toDF("payload")
      .select(col("payload"), current_timestamp().as("created"), lit(false).as("recovery"))
      .repartition(8)
    val built = graft.pipeline.Pipeline.buildOn(mix, cfg.nodes, reg,
      observeMetrics = false, persistShared = false)
    val out = built.find("resultsnode").get.output
    assert(out.rdd.getNumPartitions == 3, "shed must pin the channel count to workers")
    assert(out.count() == 15L, "capacity must be workers x buffersize, not buffersize x splits")
    // and with the default single worker: exactly one channel
    val cfg1 = AppConfig.parse(
      """application: shedtest
        |source:
        |  name: stringsource
        |  params: {path: unused}
        |nodes:
        |  - name: filternode
        |    children:
        |      - name: resultsnode
        |        buffersize: 7
        |        discard_on_full_buffer: true
        |""".stripMargin, reg).fold(e => sys.error(e), identity)
    val built1 = graft.pipeline.Pipeline.buildOn(mix, cfg1.nodes, reg,
      observeMetrics = false, persistShared = false)
    assert(built1.find("resultsnode").get.output.count() == 7L)
  }
}
