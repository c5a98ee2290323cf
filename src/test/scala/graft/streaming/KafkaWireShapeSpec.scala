package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Nodeconfig

/** Golden-fixture tests for the exact Kafka wire shape this library
  * hands Spark. The reference proves its consumer against live
  * Kafka (`inttest/integration_test.go:28-112`, 4 partitions); offline
  * the closest binding contract is the OPTION MAP and the
  * `startingOffsets`/`endingOffsets` JSON — Spark's documented format
  * (Structured Streaming + Kafka Integration Guide):
  * `{"topicA":{"0":23,"1":-1},"topicB":{"0":-2}}` — topic → object of
  * partition-as-STRING-key → offset-as-NUMBER, with -1 = latest and
  * -2 = earliest as the only special values.
  *
  * Fixtures are RECORDED strings (byte-exact assertions), then
  * re-parsed with Jackson as an independent shape check — so a
  * formatting regression (numeric partition keys, quoted offsets,
  * unsorted duplicate keys) fails loudly rather than at first contact
  * with a broker.
  */
class KafkaWireShapeSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** topic → partition(string) → offset(number), nothing else. */
  private def assertSparkOffsetShape(json: String, topic: String): Map[Int, Long] = {
    val root = mapper.readTree(json)
    assert(root.isObject && root.size() == 1, s"one topic object expected: $json")
    val t = root.get(topic)
    assert(t != null && t.isObject, s"missing topic '$topic' object: $json")
    val it = t.fields()
    val out = scala.collection.mutable.Map[Int, Long]()
    while (it.hasNext) {
      val e = it.next()
      assert(e.getKey.matches("\\d+"), s"partition keys must be numeric strings: ${e.getKey}")
      assert(e.getValue.isIntegralNumber && !e.getValue.isTextual,
        s"offsets must be JSON numbers: ${e.getValue}")
      out(e.getKey.toInt) = e.getValue.asLong()
    }
    out.toMap
  }

  test("option map golden: consumer params → Spark kafka source options") {
    val opts = KafkaSourceConfig.options(Map(
      "brokers" -> "broker1:9092,broker2:9092",
      "topic" -> "logs-all",
      "consumergroup" -> "fb-consumer",
      "buffersize" -> "500"))
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "logs-all",
      "kafka.group.id" -> "fb-consumer",
      "failOnDataLoss" -> "false",
      "maxOffsetsPerTrigger" -> "500"))
  }

  test("librdkafka.* params pass through as kafka.* options; passthrough wins (reference precedence)") {
    // the reference's client-tuning escape hatch (util/util.go
    // ApplyLibrdkafkaConf) overlays AFTER the base ConfigMap
    // (kafkaconsumer.go:109-127): librdkafka.* overrides defaults
    val opts = KafkaSourceConfig.options(Map(
      "brokers" -> "b:9092",
      "topic" -> "t",
      "librdkafka.fetch.max.bytes" -> "52428800",
      "librdkafka.session.timeout.ms" -> "10000",
      // with consumergroup unset, the migrating user's librdkafka
      // group id must survive — not be clobbered by ""
      "librdkafka.group.id" -> "legacy-group"))
    assert(opts("kafka.fetch.max.bytes") == "52428800")
    assert(opts("kafka.session.timeout.ms") == "10000")
    assert(opts("kafka.group.id") == "legacy-group")
    assert(opts("kafka.bootstrap.servers") == "b:9092")
  }

  test("librdkafka passthrough overrides an explicitly-set contract key, matching the reference") {
    val opts = KafkaSourceConfig.options(Map(
      "brokers" -> "b:9092", "topic" -> "t",
      "consumergroup" -> "contract-group",
      "librdkafka.group.id" -> "override-group"))
    assert(opts("kafka.group.id") == "override-group")
  }

  test("startingOffsets golden: capped-lag assignment across partitions") {
    // reference decision table (kafkaconsumer.go:336-384) at maxLag=300:
    //   p0: lag within cap        → start at committed
    //   p1: lag over cap          → start at high-maxLag, gap recovered
    //   p2: maxLag > high (short) → start at 0
    //   p3: committed invalid(-1) → treated as 0, then capped
    val maxLag = 300L
    val assigns = Map(
      0 -> OffsetMath.cappedStart(committed = 100L, high = 350L, maxLag),
      1 -> OffsetMath.cappedStart(committed = 100L, high = 1000L, maxLag),
      2 -> OffsetMath.cappedStart(committed = 0L, high = 250L, maxLag),
      3 -> OffsetMath.cappedStart(committed = -1L, high = 900L, maxLag))
    val json = OffsetMath.offsetsJson("logs-all", assigns.map { case (p, a) => p -> a.start })
    assert(json == """{"logs-all":{"0":100,"1":700,"2":0,"3":600}}""")
    assert(assertSparkOffsetShape(json, "logs-all")
      == Map(0 -> 100L, 1 -> 700L, 2 -> 0L, 3 -> 600L))
    // and the skipped ranges land in recovery, not the live query
    assert(assigns(1).recover.contains((100L, 700L)))
    assert(assigns(3).recover.contains((0L, 600L)))
    assert(assigns(0).recover.isEmpty && assigns(2).recover.isEmpty)
  }

  test("recovery replay golden: starting/ending offsets bound the gap exactly") {
    val cfg = Nodeconfig(Map(
      "maxpartitionlag" -> "300",
      "parallelrecoverymaxrecords" -> "400",
      "parallelrecoverymaxrate" -> "100"))
    val orch = new RecoveryOrchestrator(new RecoveryLedger, "logs-all", cfg)
    // p1 gap [100,700) is volume-capped to the NEWEST 400 → [300,700)
    // (recoveryconsumer.go:328-343: from = to − max)
    assert(orch.onAssignment(1, committed = 100L, high = 1000L) == 700L)
    // p2 gap [50,250) under the cap → replayed whole
    assert(orch.onAssignment(2, committed = 50L, high = 550L) == 250L)
    val spec = orch.replaySpec(assigned = Set(1, 2), triggerIntervalMs = 1000L).get
    assert(spec.startingOffsetsJson == """{"logs-all":{"1":300,"2":50}}""")
    assert(spec.endingOffsetsJson == """{"logs-all":{"1":700,"2":250}}""")
    assert(spec.maxOffsetsPerTrigger == 100L) // 100 ev/s × 1 s trigger
    assert(assertSparkOffsetShape(spec.startingOffsetsJson, "logs-all")
      == Map(1 -> 300L, 2 -> 50L))
    assert(assertSparkOffsetShape(spec.endingOffsetsJson, "logs-all")
      == Map(1 -> 700L, 2 -> 250L))
  }

  test("capped-lag startingOffsets flow through the source option map verbatim") {
    val json = OffsetMath.offsetsJson("logs-all", Map(0 -> 123L, 1 -> -1L))
    val opts = KafkaSourceConfig.options(
      Map("brokers" -> "b:9092", "topic" -> "logs-all"),
      startingOffsetsJson = Some(json))
    assert(opts("startingOffsets") == """{"logs-all":{"0":123,"1":-1}}""")
    // -1 (latest) / -2 (earliest) are the ONLY special offsets Spark
    // accepts; anything below -2 would be rejected broker-side
    val special = OffsetMath.offsetsJson("t", Map(0 -> -1L, 1 -> -2L))
    assert(special == """{"t":{"0":-1,"1":-2}}""")
  }

  test("partition keys serialize sorted and unique for any insertion order") {
    val json = OffsetMath.offsetsJson("t",
      scala.collection.immutable.ListMap(11 -> 5L, 2 -> 7L, 0 -> 1L))
    assert(json == """{"t":{"0":1,"2":7,"11":5}}""")
    assertSparkOffsetShape(json, "t")
  }
}
