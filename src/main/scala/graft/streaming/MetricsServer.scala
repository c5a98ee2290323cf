package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Consumer-position gauges derived from `StreamingQueryProgress`
  * sources — the Spark-native stand-in for the reference's statistics
  * callback (`node/kafkaconsumer/consumermetrics.go:41-146`): Spark's
  * Kafka source already reports per-partition
  * `startOffset/endOffset/latestOffset`, so stored offset, high
  * watermark, and lag fall out of each micro-batch progress with no
  * extra broker round trip.
  *
  * Offset JSON is source-agnostic: Kafka reports
  * `{"topic":{"partition":offset}}`, file/memory sources report scalar
  * version numbers — numeric leaves are flattened either way, keyed by
  * `topic-partition` like the reference's partition label.
  */
final class ConsumerLagTracker extends StreamingQueryListener {

  private val mapper = new ObjectMapper()
  /** partition label → (storedOffset, highWatermark, lag). */
  val positions = TrieMap[String, (Long, Long, Long)]()
  /** events consumed per query name (events_consumed_total). */
  val consumed = TrieMap[String, Long]()
  /** query name → (state rows, state bytes) summed over the query's
    * stateful operators — how a streaming dedup's bucket state or a
    * mixture's budget map is watched at scale (state growth is the
    * failure mode the maxBucket/TTL caps exist to bound, and it must
    * be scrapeable, not inferred).
    */
  val stateSizes = TrieMap[String, (Long, Long)]()

  /** micro-batch duration histogram (the Spark-native stand-in for the
    * reference's per-node `node_processing_time_sec` — stages fuse into
    * one codegen pass here, so the batch IS the processing unit).
    * Upper bounds in seconds; cumulative counts per prometheus rules.
    */
  val batchBuckets: Array[Double] = Array(0.01, 0.05, 0.25, 1.0, 5.0, 30.0)
  private[streaming] val batchCounts = new Array[Long](batchBuckets.length + 1)
  private[streaming] var batchSum = 0.0
  private[streaming] var batchN = 0L

  private def observeBatch(seconds: Double): Unit = synchronized {
    var i = 0
    while (i < batchBuckets.length && seconds > batchBuckets(i)) i += 1
    batchCounts(i) += 1
    batchSum += seconds
    batchN += 1
  }

  /** (bucket upper bound or +Inf, cumulative count) pairs + (sum, count). */
  def batchHistogram: (Seq[(String, Long)], Double, Long) = synchronized {
    val cum = batchCounts.scanLeft(0L)(_ + _).tail
    val labels = batchBuckets.map(_.toString) :+ "+Inf"
    (labels.zip(cum).toSeq, batchSum, batchN)
  }

  private def leaves(node: JsonNode, path: String,
                     out: TrieMap[String, Long]): Unit = node match {
    case n if n == null => ()
    case n if n.isNumber => out(if (path.isEmpty) "0" else path) = n.asLong()
    case n if n.isObject =>
      n.properties().asScala.foreach { e =>
        leaves(e.getValue, if (path.isEmpty) e.getKey else s"$path-${e.getKey}", out)
      }
    case _ => ()
  }

  private[streaming] def flatten(json: String): Map[String, Long] = {
    val out = TrieMap[String, Long]()
    try leaves(mapper.readTree(json), "", out) catch { case _: Exception => () }
    out.toMap
  }

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val name = Option(e.progress.name).getOrElse(e.progress.id.toString)
    consumed.updateWith(name) {
      case Some(x) => Some(x + e.progress.numInputRows)
      case None => Some(e.progress.numInputRows)
    }
    Option(e.progress.batchDuration).filter(_ > 0)
      .foreach(ms => observeBatch(ms / 1000.0))
    val ops = e.progress.stateOperators
    if (ops != null && ops.nonEmpty)
      stateSizes(name) = (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum)
    e.progress.sources.foreach { s =>
      val end = flatten(Option(s.endOffset).getOrElse(""))
      val latest = flatten(Option(s.latestOffset).getOrElse(""))
      end.foreach { case (part, off) =>
        val hi = latest.getOrElse(part, off)
        positions(part) = (off, hi, math.max(0L, hi - off))
      }
    }
  }
}

/** Prometheus scrape endpoint — the analog of the reference's metrics
  * server (`metrics/metrics_server.go:19-45`): serves `/metrics` in the
  * text exposition format with the reference's metric names —
  * `node_received_events_total` / `node_processed_events_total`
  * (`metrics/metrics.go:106-145`, from [[PipelineMetrics]] observe
  * counters) and `consumer_stored_offset` / `consumer_high_watermark` /
  * `consumer_offset_lag` / `events_consumed_total`
  * (`consumermetrics.go:41-146`, from [[ConsumerLagTracker]]).
  *
  * Listener-fed and driver-local: a scrape reads in-memory counters,
  * never triggers a Spark job.
  */
final class MetricsServer(
    spark: SparkSession,
    metrics: PipelineMetrics,
    prefix: String = "graft",
    port: Int = 0) {

  private val lagTracker = new ConsumerLagTracker
  private var server: HttpServer = _

  def start(): this.type = {
    spark.streams.addListener(lagTracker)
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/metrics", (ex: HttpExchange) => serve(ex))
    server.start()
    this
  }

  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = {
    if (server != null) server.stop(0)
    spark.streams.removeListener(lagTracker)
  }

  /** render the exposition text (exposed for tests). */
  def render(): String = {
    val sb = new StringBuilder
    def gauge(name: String, labels: String, v: Long): Unit =
      sb.append(s"${prefix}_$name$labels $v\n")
    def typ(name: String, t: String): Unit =
      sb.append(s"# TYPE ${prefix}_$name $t\n")

    val snap = metrics.snapshot
    val received = snap.collect { case (k, v) if k.endsWith(".received") =>
      k.stripSuffix(".received") -> v }
    val emitted = snap.collect { case (k, v) if k.endsWith(".emitted") =>
      k.stripSuffix(".emitted") -> v }
    typ("node_received_events_total", "counter")
    received.toSeq.sortBy(_._1).foreach { case (id, v) =>
      gauge("node_received_events_total", s"""{node_id="$id"}""", v) }
    typ("node_processed_events_total", "counter")
    emitted.toSeq.sortBy(_._1).foreach { case (id, v) =>
      gauge("node_processed_events_total", s"""{node_id="$id"}""", v) }

    typ("events_consumed_total", "counter")
    lagTracker.consumed.toSeq.sortBy(_._1).foreach { case (q, v) =>
      gauge("events_consumed_total", s"""{query="$q"}""", v) }
    typ("consumer_stored_offset", "gauge")
    typ("consumer_high_watermark", "gauge")
    typ("consumer_offset_lag", "gauge")
    lagTracker.positions.toSeq.sortBy(_._1).foreach { case (part, (off, hi, lag)) =>
      gauge("consumer_stored_offset", s"""{partition="$part"}""", off)
      gauge("consumer_high_watermark", s"""{partition="$part"}""", hi)
      gauge("consumer_offset_lag", s"""{partition="$part"}""", lag)
    }

    // state-store sizes per stateful query (rows + bytes)
    typ("state_rows", "gauge")
    typ("state_memory_bytes", "gauge")
    lagTracker.stateSizes.toSeq.sortBy(_._1).foreach { case (q, (rows, bytes)) =>
      gauge("state_rows", s"""{query="$q"}""", rows)
      gauge("state_memory_bytes", s"""{query="$q"}""", bytes)
    }

    // batch-operator run forensics (convergence rounds, fallback
    // switches) from the driver-side gauge registry
    graft.OpGauges.snapshot.toSeq.sortBy(_._1).foreach { case (name, v) =>
      typ(name, if (name.endsWith("_total")) "counter" else "gauge")
      gauge(name, "", v)
    }

    // batch-duration histogram (node_processing_time_sec analog)
    val (buckets, sum, n) = lagTracker.batchHistogram
    typ("batch_duration_seconds", "histogram")
    buckets.foreach { case (le, c) =>
      sb.append(s"""${prefix}_batch_duration_seconds_bucket{le="$le"} $c""").append('\n')
    }
    sb.append(s"${prefix}_batch_duration_seconds_sum $sum\n")
    sb.append(s"${prefix}_batch_duration_seconds_count $n\n")
    sb.toString
  }

  private def serve(ex: HttpExchange): Unit = {
    val body = render().getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "text/plain; version=0.0.4")
    ex.sendResponseHeaders(200, body.length)
    ex.getResponseBody.write(body)
    ex.close()
  }
}
