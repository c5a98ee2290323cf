package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.AppConfig
import graft.examples.Examples

class ExamplesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("kafkatokafka example: parses, builds JSON, produces; nothing dead-lettered") {
    val reg = Registry.builtins()
    val cfg = AppConfig.parse(Examples.kafkaToKafkaYaml(dir), reg)
      .fold(e => fail(s"config rejected: $e"), identity)
    val built = Pipeline.build(spark, cfg, reg)
    val total = spark.read.parquet(s"$dir/events.parquet").count()
    val out = built.find("kafkaproducer").get.output
    assert(out.count() == total)
    val sample = out.select(col("value").cast("string")).head().getString(0)
    assert(sample.startsWith("{\"program\":\"app") && sample.contains("\"message\":\"msg "))
    assert(built.find("syslogparser").get.deadLetters.get.count() == 0)
  }

  test("logging example: docbuilder type flip reaches the ES node") {
    val reg = Registry.builtins()
    val cfg = AppConfig.parse(Examples.loggingYaml(dir), reg)
      .fold(e => fail(s"config rejected: $e"), identity)
    val built = Pipeline.build(spark, cfg, reg)
    val es = built.find("elasticsearch").get.output
    val docs = es.select(col("doc")).collect().map(_.getString(0))
    assert(docs.nonEmpty)
    // pid < 100 → numeric program; pid >= 100 → object program
    assert(docs.exists(_.startsWith("{\"program\":{")))
    assert(docs.exists(d => d.startsWith("{\"program\":") && !d.startsWith("{\"program\":{")))
  }
}
