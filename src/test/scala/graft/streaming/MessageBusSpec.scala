package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Compacted at-least-once control plane semantics
  * (`message/kakfamessagereceiver.go:102-236`,
  * `executor/message_int_test.go` behaviors: delivery, ack suppresses
  * redelivery, replay on startup, latest-per-key wins).
  */
class MessageBusSpec extends AnyFunSuite {

  private def newBus() = {
    val dir = Files.createTempDirectory("bus")
    (dir.resolve("messages.jsonl"), new FileMessageBus(dir.resolve("messages.jsonl")))
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
