package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Nodeconfig

/** The recovery scenario of `inttest/integration_test.go:125-212`:
  * 4,000 records over 4 partitions, maxpartitionlag=100,
  * parallelrecoverymaxrecords=500, rate=100 → live starts at high−100,
  * exactly 500/partition recovered, rate-limited.
  */
class RecoveryOrchestratorSpec extends AnyFunSuite {

  private def orch(bus: Option[MessageBus] = None) = new RecoveryOrchestrator(
    new RecoveryLedger(),
    topic = "logs-all",
    config = Nodeconfig(Map(
      "maxpartitionlag" -> "100",
      "parallelrecoverymaxrecords" -> "500",
      "parallelrecoverymaxrate" -> "100")),
    bus = bus)

  test("inttest scenario: capped start + 500-record recovery per partition") {
    val o = orch()
    // 4 partitions, 1000 records each, nothing committed
    val starts = (0 until 4).map(p => o.onAssignment(p, committed = -1001, high = 1000))
    assert(starts.forall(_ == 900)) // live consumes the newest 100
    assert(o.pendingCount == 4)
    val spec = o.replaySpec(Set(0, 1, 2, 3), triggerIntervalMs = 1000).get
    // volume cap keeps newest 500 of the [0, 900) gap
    assert(spec.startingOffsetsJson == """{"logs-all":{"0":400,"1":400,"2":400,"3":400}}""")
    assert(spec.endingOffsetsJson == """{"logs-all":{"0":900,"1":900,"2":900,"3":900}}""")
    assert(spec.maxOffsetsPerTrigger == 100) // 100 events/s × 1s trigger
  }

  test("progress checkpoints shrink the range; completion clears it") {
    val o = orch()
    o.onAssignment(0, -1001, 1000)
    o.progress(0, 700)
    val spec = o.replaySpec(Set(0)).get
    assert(spec.startingOffsetsJson == """{"logs-all":{"0":700}}""")
    o.complete(0, 900)
    assert(o.pendingCount == 0)
    assert(o.replaySpec(Set(0)).isEmpty)
  }

  test("replay spec only covers assigned partitions") {
    val o = orch()
    o.onAssignment(0, -1001, 1000)
    o.onAssignment(7, -1001, 1000)
    val spec = o.replaySpec(Set(7)).get
    assert(spec.startingOffsetsJson == """{"logs-all":{"7":400}}""")
  }

  test("no recovery when lag within cap") {
    val o = orch()
    assert(o.onAssignment(0, committed = 950, high = 1000) == 950)
    assert(o.pendingCount == 0)
  }

  test("recoverycancelall over the bus clears the ledger; requests publish to the bus") {
    val dir = Files.createTempDirectory("busr")
    val bus = new FileMessageBus(dir.resolve("m.jsonl"))
    var published = List.empty[String]
    bus.subscribe(Seq("recoveryrequest"), m => published ::= m.key)
    bus.start()
    val o = orch(Some(bus))
    o.onAssignment(0, -1001, 1000)
    o.onAssignment(1, -1001, 1000)
    assert(published.toSet == Set("0", "1"))
    assert(o.pendingCount == 2)
    bus.send(BusMessage("recoverycancelall", "all", Array.emptyByteArray))
    assert(o.pendingCount == 0)
  }
}
