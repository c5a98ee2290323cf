package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds Spark Kafka source options reproducing the reference
  * consumer's semantics (`node/kafkaconsumer/kafkaconsumer.go`):
  *
  *   - `brokers`/`topic`/`consumergroup` params → Kafka source options
  *   - `buffersize` → `maxOffsetsPerTrigger` (micro-batch pull replaces
  *     the bounded channel; backpressure is structural in Spark)
  *   - `maxpartitionlag` → capped-lag `startingOffsets` computed by
  *     [[OffsetMath.cappedStart]] per partition
  *     (`kafkaconsumer.go:336-384`) — data loss warned, recovery range
  *     recorded for the parallel-recovery path.
  *
  * Offline containers have no Kafka; the option map is built and unit
  * tested, and `batch` falls back to an empty event frame when brokers
  * are unreachable is NOT done here — callers choose the source type.
  */
object KafkaSourceConfig {

  /** Options for readStream.format("kafka"). `startingOffsetsJson`
    * comes from [[OffsetMath]] when a capped-lag start is in effect.
    *
    * `librdkafka.`-prefixed params pass through as `kafka.`-prefixed
    * source options — the reference's client-tuning escape hatch
    * (`util/util.go` ApplyLibrdkafkaConf strips the prefix and hands
    * the pair to the client config), mapped onto Spark's identical
    * mechanism (its Kafka source forwards `kafka.*` options to the
    * consumer). A migrating user's `librdkafka.fetch.max.bytes: …`
    * keeps working. Matching the reference's precedence
    * (ApplyLibrdkafkaConf overlays AFTER the base ConfigMap,
    * `kafkaconsumer.go:109-127`), passthrough keys are applied LAST —
    * `librdkafka.group.id`/`session.timeout.ms` override the
    * contract defaults. Empty-valued contract keys (unset
    * `consumergroup`/`brokers`) are omitted so they can't clobber a
    * passthrough value with "".
    */
  def options(params: Map[String, String], startingOffsetsJson: Option[String] = None): Map[String, String] = {
    val passthrough = params.collect {
      case (k, v) if k.startsWith("librdkafka.") =>
        "kafka." + k.stripPrefix("librdkafka.") -> v
    }
    val contract = Map(
      "kafka.bootstrap.servers" -> params.getOrElse("brokers", ""),
      "subscribe" -> params.getOrElse("topic", ""),
      "kafka.group.id" -> params.getOrElse("consumergroup", ""),
      "failOnDataLoss" -> "false", // broker truncation handled, recoveryconsumer.go:207-251
      "maxOffsetsPerTrigger" -> params.getOrElse("buffersize", "1000")
    ).filter(_._2.nonEmpty)
    contract ++ passthrough ++ startingOffsetsJson.map("startingOffsets" -> _)
  }

  /** Kafka wire records → event envelope (payload bytes, created,
    * recovery=false), the shape of `processEvent`
    * (`kafkaconsumer.go:219-226`).
    */
  def toEvents(kafka: DataFrame): DataFrame =
    kafka.select(
      col("value").as("payload"),
      col("timestamp").cast("timestamp").as("created"),
      lit(false).as("recovery"))

  def stream(spark: SparkSession, params: Map[String, String]): DataFrame =
    toEvents(
      options(params).foldLeft(spark.readStream.format("kafka")) {
        case (r, (k, v)) => r.option(k, v)
      }.load())

  def batch(spark: SparkSession, params: Map[String, String]): DataFrame =
    toEvents(
      options(params).foldLeft(spark.read.format("kafka")) {
        case (r, (k, v)) => r.option(k, v)
      }.load())
}
