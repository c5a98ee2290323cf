package graft.sinks

import org.apache.spark.sql.DataFrame

/** Batch-or-micro-batch write target. Streaming execution calls
  * `writeBatch` once per micro-batch from inside foreachBatch; batch
  * execution calls it once.
  */
trait Sink extends Serializable {
  def writeBatch(df: DataFrame): Unit
}

/** Append parquet files (the offline stand-in for a real sink). */
final class ParquetSink(path: String) extends Sink {
  def writeBatch(df: DataFrame): Unit =
    df.write.mode("append").parquet(path)
}

/** Kafka sink options for a ProduceRequest-shaped frame
  * (`topic`,`value`) — per-row topic override is native
  * (`kafkaproducer.go:99-106`). Producer tuning mirrors the reference's
  * librdkafka settings (`kafkaproducer.go:63-73`).
  */
object KafkaSinkConfig {
  def options(brokers: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> brokers,
    "kafka.compression.type" -> "snappy",
    "kafka.linger.ms" -> "3000",
    "kafka.batch.size" -> "262144")

  def write(df: DataFrame, brokers: String): Unit =
    options(brokers).foldLeft(df.write.format("kafka"))((w, kv) => w.option(kv._1, kv._2)).save()
}

/** Driver-side collecting sink for tests (small data only). */
final class CollectingSink extends Sink {
  val batches = new java.util.concurrent.CopyOnWriteArrayList[Array[org.apache.spark.sql.Row]]()
  def writeBatch(df: DataFrame): Unit = batches.add(df.collect())
  def rows: Seq[org.apache.spark.sql.Row] = {
    import scala.jdk.CollectionConverters._
    batches.asScala.toSeq.flatten
  }
}
