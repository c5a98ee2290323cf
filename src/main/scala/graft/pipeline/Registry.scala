package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.RegistryView

/** Name → factory registry for sources and node types — mirrors the
  * reference's singleton registry (`node/registry.go:14-102`) minus the
  * singleton: pipelines own their registry instance.
  */
final class Registry extends RegistryView {
  private val sources = mutable.Map[String, SourceFactory]()
  private val nodes = mutable.Map[String, StageFactory]()

  def registerSourceType(name: String, f: SourceFactory): Unit = sources(name) = f
  def registerNodeType(name: String, f: StageFactory): Unit = nodes(name) = f

  override def sourceProduces(name: String): Option[String] = sources.get(name).map(_.produces)
  override def nodeTypes(name: String): Option[(String, String)] =
    nodes.get(name).map(f => (f.consumes, f.produces))

  /** panics on unknown type, like `registry.go:70-80`. */
  def instantiateNode(name: String, params: Map[String, String]): Stage =
    nodes.getOrElse(name, throw new IllegalArgumentException(s"no node registered for type $name")).build(params)

  def instantiateSource(name: String): SourceFactory =
    sources.getOrElse(name, throw new IllegalArgumentException(s"no source registered for type $name"))
}

/** Built-in types, mirroring the reference's `executor/noderegistrar.go:16-39`
  * (kafkaconsumer; syslogparser, kafkaproducer, errorkafkaproducer,
  * elasticsearch) plus the deterministic test kit from
  * `internal/testnodetypes.go`.
  */
object Registry {
  import graft.config.TypeTags

  val SyslogMsg = "*captainslog.SyslogMsg"
  val ProduceReq = "firebolt.ProduceRequest"
  val IndexReq = "elasticsearch.IndexRequest"
  val StringT = "string"

  def builtins(): Registry = {
    val r = new Registry

    // sources ------------------------------------------------------
    // Offline stand-in for the Kafka source: a parquet/file scan that
    // yields the same `Event{payload []byte}` shape. The real Kafka
    // path (readStream.format("kafka")) is built by
    // graft.streaming.KafkaSourceConfig; semantics identical.
    def parquetEvents(spark: SparkSession, params: Map[String, String], payloadType: String): DataFrame = {
      val path = params.getOrElse("path", sys.error("missing config value [path]"))
      val payload = params.get("payloadexpr").map(expr)
        .getOrElse(col(params.getOrElse("payloadcolumn", "payload")))
      val created = params.get("createdcolumn").map(col).getOrElse(current_timestamp())
      spark.read.parquet(path).select(
        payload.cast(payloadType).as("payload"),
        created.cast("timestamp").as("created"),
        lit(false).as("recovery"))
    }
    r.registerSourceType("parquetsource", new SourceFactory {
      val produces = TypeTags.Bytes
      def read(spark: SparkSession, params: Map[String, String]): DataFrame =
        parquetEvents(spark, params, "binary")
    })
    // string-payload variant (the analog of the test kit's
    // `simplesource`, internal/testnodetypes.go:85-131)
    r.registerSourceType("stringsource", new SourceFactory {
      val produces = StringT
      def read(spark: SparkSession, params: Map[String, String]): DataFrame =
        parquetEvents(spark, params, "string")
    })
    r.registerSourceType("kafkaconsumer", new SourceFactory {
      val produces = TypeTags.Bytes
      def read(spark: SparkSession, params: Map[String, String]): DataFrame =
        graft.streaming.KafkaSourceConfig.batch(spark, params)
    })

    // transforms ---------------------------------------------------
    r.registerNodeType("syslogparser", new StageFactory {
      val consumes = TypeTags.Bytes
      val produces = SyslogMsg
      def build(params: Map[String, String]): Stage =
        graft.functions.Syslog.stage
    })

    // jsonbuilder (examples/kafkatokafka/jsonbuilder.go:37-61):
    // SyslogMsg → JSON {program, host, message} → ProduceRequest.
    // Field order matches the Go struct's marshal order.
    r.registerNodeType("jsonbuilder", new StageFactory {
      val consumes = SyslogMsg
      val produces = ProduceReq
      def build(params: Map[String, String]): Stage = Stage(
        project = df => df.select(
          struct(
            lit(params.getOrElse("topic", "logs-json")).as("topic"),
            encode(to_json(struct(
              col("payload.program").as("program"),
              col("payload.host").as("host"),
              col("payload.content").as("message"))), "UTF-8").as("message")).as("payload"),
          col("created"), col("recovery")))
    })

    // docbuilder (examples/logging/docbuilder.go:55-98): SyslogMsg →
    // ES IndexRequest. Mirrors the reference's intentional type flip —
    // docs with pid < 100 carry `program` as a number, later ones as an
    // object — which is what exercises dead-lettering downstream.
    r.registerNodeType("docbuilder", new StageFactory {
      val consumes = SyslogMsg
      val produces = IndexReq
      def build(params: Map[String, String]): Stage = Stage(
        project = df => {
          val pid = col("payload.pid").cast("int")
          val doc = when(pid < 100,
            to_json(struct(pid.as("program"), col("payload.host").as("host"),
              col("payload.content").as("message"))))
            .otherwise(
              to_json(struct(
                struct(pid.as("pid"), col("payload.program").as("name")).as("program"),
                col("payload.host").as("host"),
                col("payload.content").as("message"))))
          df.select(
            struct(
              lit(params.getOrElse("index", "logs")).as("index"),
              lit(params.getOrElse("mapping-type", "_doc")).as("mapping_type"),
              lit("").as("doc_id"),
              doc.as("doc")).as("payload"),
            col("created"), col("recovery"))
        })
    })

    // sinks --------------------------------------------------------
    r.registerNodeType("kafkaproducer", new StageFactory {
      val consumes = ProduceReq
      val produces = ProduceReq
      def build(params: Map[String, String]): Stage = Stage(
        // payload is struct<topic,message>; emit Kafka sink shape
        project = df => df.select(
          col("payload.topic").as("topic"),
          col("payload.message").cast("binary").as("value"),
          col("created"), col("recovery")),
        terminal = true)
    })
    r.registerNodeType("errorkafkaproducer", new StageFactory {
      val consumes = TypeTags.EventError
      val produces = ProduceReq
      def build(params: Map[String, String]): Stage = Stage(
        // EventError rows → JSON dead-letter payload (error.go:29-47)
        project = df => df.select(
          lit(params.getOrElse("topic", "errors")).as("topic"),
          graft.functions.DeadLetter.json(
            col("payload.timestamp"), col("payload.event"),
            col("payload.error.code"), col("payload.error.message")).cast("binary").as("value"),
          col("created"), col("recovery")),
        terminal = true)
    })

    // elasticsearch bulk sink (node/elasticsearch/elasticsearch.go):
    // terminal; batch mode projects IndexRequest rows into the flat
    // shape graft.sinks.EsBulkSink consumes inside foreachBatch.
    r.registerNodeType("elasticsearch", new StageFactory {
      val consumes = IndexReq
      val produces = IndexReq
      def build(params: Map[String, String]): Stage = Stage(
        project = df => df.select(
          col("payload.index").as("index"),
          col("payload.mapping_type").as("mappingType"),
          col("payload.doc_id").as("docId"),
          col("payload.doc").as("doc"),
          col("created"), col("recovery")),
        terminal = true)
    })

    // deterministic test kit (internal/testnodetypes.go) ------------
    // string → ProduceRequest (internal/testnodetypes.go:294-306)
    r.registerNodeType("stringtoproducerequestnode", new StageFactory {
      val consumes = StringT
      val produces = ProduceReq
      def build(params: Map[String, String]): Stage = Stage(
        project = df => df.select(
          struct(
            lit(params.getOrElse("topic", "out")).as("topic"),
            encode(col("payload").cast("string"), "UTF-8").as("message")).as("payload"),
          col("created"), col("recovery")))
    })
    // string → IndexRequest with a unique doc id
    // (internal/testnodetypes.go:412-430; running counter → a
    // partition-safe monotonically_increasing_id here)
    r.registerNodeType("indexrequestbuildernode", new StageFactory {
      val consumes = StringT
      val produces = IndexReq
      def build(params: Map[String, String]): Stage = Stage(
        project = df => df.select(
          struct(
            lit(params.getOrElse("index", "test")).as("index"),
            lit("_doc").as("mapping_type"),
            concat(monotonically_increasing_id(), lit(":"),
              col("payload").cast("string")).as("doc_id"),
            to_json(struct(col("payload").cast("string").as("value"))).as("doc")).as("payload"),
          col("created"), col("recovery")))
    })
    // payload: string; "filterme*" filtered, "error*" dead-lettered.
    r.registerNodeType("filternode", new StageFactory {
      val consumes = StringT
      val produces = StringT
      def build(params: Map[String, String]): Stage = {
        val prefix = params.getOrElse("prefix", "filterme")
        Stage(keepWhen = Some(!col("payload").cast("string").startsWith(prefix)))
      }
    })
    r.registerNodeType("errornode", new StageFactory {
      val consumes = StringT
      val produces = StringT
      def build(params: Map[String, String]): Stage = {
        val prefix = params.getOrElse("prefix", "error")
        Stage(failWhen = Some(FailSpec(
          cond = col("payload").cast("string").startsWith(prefix),
          code = lit("ERR_TEST"),
          msg = concat(lit("test error on "), col("payload").cast("string")))))
      }
    })
    r.registerNodeType("fanoutnode", new StageFactory {
      val consumes = StringT
      val produces = StringT
      def build(params: Map[String, String]): Stage = {
        val n = params.getOrElse("copies", "3").toInt
        Stage(expand = Some(df =>
          df.withColumn("payload",
            explode(array((0 until n).map(i =>
              concat(col("payload").cast("string"), lit(s"-$i"))): _*)))))
      }
    })
    // slownode (internal/testnodetypes.go: fixed sleep per event) —
    // latency injection for backpressure drills; the delay is
    // configurable here. Intentionally a mapPartitions pass-through (a
    // test-kit node simulating a slow external call, not a production
    // transform — blocking cannot be expressed declaratively).
    r.registerNodeType("slownode", new StageFactory {
      val consumes = StringT
      val produces = StringT
      def build(params: Map[String, String]): Stage = {
        val ms = params.getOrElse("latency_ms", "5000").toLong
        Stage(project = df => {
          val enc = org.apache.spark.sql.Encoders.row(df.schema)
          df.mapPartitions(it => it.map { r => Thread.sleep(ms); r })(enc)
        })
      }
    })
    // document chunker: string payload → one event per token-window
    // chunk (FanoutNode shape); pure codegen expressions, no shuffle —
    // see graft.operators.Chunking for the batch/query form.
    r.registerNodeType("chunker", new StageFactory {
      val consumes = StringT
      val produces = StringT
      def build(params: Map[String, String]): Stage = {
        val size = params.getOrElse("chunk_size", "64").toInt
        val overlap = params.getOrElse("overlap", "16").toInt
        Stage(expand = Some(df =>
          df.withColumn("payload",
            explode(graft.operators.Chunking.chunkTexts(
              col("payload").cast("string"), size, overlap)))))
      }
    })
    // per-row ASYNC node (node/node.go:36-39, docs/async-nodes.md):
    // each event fires a blocking RPC-style call on a bounded in-flight
    // pool; the outcome routes declaratively (ReturnEvent → children,
    // ReturnError → error_handler, ReturnFiltered → dropped). The call
    // here is a DETERMINISTIC fake (no network offline): payloads with
    // `filter_prefix` filter, with `error_prefix` error, the rest
    // return md5(payload) — the md5 standing in for the remote
    // system's response so batch results are oracle-able.
    r.registerNodeType("asyncrpcnode", new StageFactory {
      val consumes = StringT
      val produces = StringT
      def build(params: Map[String, String]): Stage = {
        val errorPrefix = params.getOrElse("error_prefix", "error")
        val filterPrefix = params.getOrElse("filter_prefix", "filterme")
        val maxInFlight = params.getOrElse("max_in_flight", "8").toInt
        val latencyMs = params.getOrElse("latency_ms", "0").toLong
        // a payload with `slow_prefix` sleeps slow_ms — the hung-endpoint
        // drill for the per-call deadline (timeout_ms; 0 = disabled)
        val slowPrefix = params.getOrElse("slow_prefix", "")
        val slowMs = params.getOrElse("slow_ms", "5000").toLong
        val timeoutMs = params.getOrElse("timeout_ms", "0").toLong
        AsyncStage.stage(
          payload => {
            if (latencyMs > 0) Thread.sleep(latencyMs) // simulated RPC round trip
            if (payload == null)
              AsyncStage.Errored("ERR_CONVERSION_FAILED", "null payload")
            else if (slowPrefix.nonEmpty && payload.startsWith(slowPrefix)) {
              Thread.sleep(slowMs) // hung endpoint
              AsyncStage.Returned(payload)
            } else if (payload.startsWith(errorPrefix))
              AsyncStage.Errored("ERR_ASYNC", s"async rpc failed on $payload")
            else if (payload.startsWith(filterPrefix))
              AsyncStage.Filtered
            else {
              val d = java.security.MessageDigest.getInstance("MD5")
              AsyncStage.Returned(
                d.digest(payload.getBytes("UTF-8")).map("%02x".format(_)).mkString)
            }
          },
          maxInFlight, timeoutMs)
      }
    })
    r.registerNodeType("resultsnode", new StageFactory {
      val consumes = StringT
      val produces = StringT
      def build(params: Map[String, String]): Stage = Stage()
    })
    // error handler used in config tests: consumes EventError
    r.registerNodeType("errorhandlernode", new StageFactory {
      val consumes = TypeTags.EventError
      val produces = TypeTags.EventError
      def build(params: Map[String, String]): Stage = Stage()
    })

    r
  }
}
