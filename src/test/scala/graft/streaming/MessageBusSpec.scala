package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Compacted at-least-once control plane semantics
  * (`message/kakfamessagereceiver.go:102-236`,
  * `executor/message_int_test.go` behaviors: delivery, ack suppresses
  * redelivery, replay on startup, latest-per-key wins).
  */
class MessageBusSpec extends AnyFunSuite {

  private def newBus(replayCap: Int = 50000) = {
    val dir = Files.createTempDirectory("bus")
    (dir.resolve("messages.jsonl"),
      new FileMessageBus(dir.resolve("messages.jsonl"), replayCap))
  }

  test("live delivery to subscribers of the type, including self-sends") {
    val (_, bus) = newBus()
    var got = List.empty[String]
    bus.subscribe(Seq("recoveryrequest"), m => got ::= new String(m.payload))
    bus.start()
    bus.send(BusMessage("recoveryrequest", "0", "r1".getBytes))
    bus.send(BusMessage("othertype", "0", "nope".getBytes))
    assert(got == List("r1"))
  }

  test("replay on startup delivers only latest unacked per key") {
    val (path, bus) = newBus()
    bus.send(BusMessage("recoveryrequest", "0", "old".getBytes))
    bus.send(BusMessage("recoveryrequest", "0", "new".getBytes))
    bus.send(BusMessage("recoveryrequest", "1", "p1".getBytes))
    bus.send(BusMessage("recoveryrequest", "2", "p2".getBytes))
    bus.ack("recoveryrequest", "2")

    // "restart": new instance over the same file
    val bus2 = new FileMessageBus(path)
    var got = Map.empty[String, String]
    bus2.subscribe(Seq("recoveryrequest"), m => got += (m.key -> new String(m.payload)))
    bus2.start()
    assert(got == Map("0" -> "new", "1" -> "p1")) // latest wins, acked suppressed
  }

  test("startup compacts the file to latest-per-key") {
    val (path, bus) = newBus()
    (1 to 10).foreach(i => bus.send(BusMessage("t", "k", s"v$i".getBytes)))
    bus.start()
    assert(Files.readAllLines(path).size == 1)
  }

  test("an ack performed DURING replay survives the startup compaction") {
    // the RecoveryDrill shape: the handler processes the replayed
    // request and acks it inside its own delivery — compacting from
    // the pre-delivery snapshot would clobber that ack and redeliver
    // the completed request on every restart forever
    val (path, bus) = newBus()
    bus.send(BusMessage("recoveryrequest", "7", "range".getBytes))
    val reopen = new FileMessageBus(path)
    reopen.subscribe(Seq("recoveryrequest"), m => reopen.ack(m.messageType, m.key))
    reopen.start() // delivery acks mid-replay; compaction must keep it
    var redelivered = 0
    val reopen2 = new FileMessageBus(path)
    reopen2.subscribe(Seq("recoveryrequest"), _ => redelivered += 1)
    reopen2.start()
    assert(redelivered == 0, "ack written during replay was clobbered by compaction")
  }

  test("replayCap bounds DELIVERY, not retention; control chars in keys round-trip") {
    val (path, bus) = newBus(replayCap = 3)
    // the oldest unacked message falls outside the replay window …
    bus.send(BusMessage("t", "old", "v0".getBytes))
    (1 to 4).foreach(i => bus.send(BusMessage("t", s"k$i", s"v$i".getBytes)))
    var got = Set.empty[String]
    val reopen = new FileMessageBus(path, replayCap = 3)
    reopen.subscribe(Seq("t"), m => got += m.key)
    reopen.start()
    assert(!got.contains("old") && got == Set("k2", "k3", "k4"))
    // … but compaction RETAINS it for a future, larger-cap replay
    var all = Set.empty[String]
    val uncapped = new FileMessageBus(path)
    uncapped.subscribe(Seq("t"), m => all += m.key)
    uncapped.start()
    assert(all.contains("old"), "out-of-window unacked message was deleted by compaction")
    // a key with newline/tab survives append → replay → compaction intact
    val (path2, bus2) = newBus()
    bus2.send(BusMessage("t", "node-a\nnode-b\t\"x\\y\"", "v".getBytes))
    var keys = List.empty[String]
    val reopen2 = new FileMessageBus(path2)
    reopen2.subscribe(Seq("t"), m => keys ::= m.key)
    reopen2.start()
    assert(keys == List("node-a\nnode-b\t\"x\\y\""))
  }

  test("at-least-once: redelivery after restart without ack, idempotent handlers required") {
    val (path, bus) = newBus()
    bus.send(BusMessage("t", "k", "v".getBytes))
    var count = 0
    val reopen1 = new FileMessageBus(path)
    reopen1.subscribe(Seq("t"), _ => count += 1)
    reopen1.start()
    val reopen2 = new FileMessageBus(path)
    reopen2.subscribe(Seq("t"), _ => count += 1)
    reopen2.start()
    assert(count == 2) // delivered on every restart until acked
    reopen2.ack("t", "k")
    val reopen3 = new FileMessageBus(path)
    reopen3.subscribe(Seq("t"), _ => count += 1)
    reopen3.start()
    assert(count == 2)
  }
}
