package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** fbcontext surface parity (`fbcontext/fbcontext.go:86-99`): message
  * subscribe/accepts gating, ack, and the leader/identity shims.
  */
class FbContextSpec extends AnyFunSuite {

  private def newCtx(): (FbContext, FileMessageBus) = {
    val bus = new FileMessageBus(Files.createTempFile("fbctx", ".bus"))
    (new FbContext(bus, "app-123"), bus)
  }

  test("driver is always leader; instance id exposed") {
    val (ctx, _) = newCtx()
    assert(ctx.isLeader)
    assert(ctx.instanceId == "app-123")
  }

  test("subscribe registers accepted types and delivers matching messages") {
    val (ctx, bus) = newCtx()
    val seen = collection.mutable.ListBuffer[String]()
    ctx.subscribe(Seq("recoveryrequest", "recoverycancelall"),
      m => seen += s"${m.messageType}:${m.key}")
    bus.start()
    assert(ctx.acceptsMessage("recoveryrequest"))
    assert(!ctx.acceptsMessage("somethingelse"))
    assert(ctx.subscriptions == Set("recoveryrequest", "recoverycancelall"))

    ctx.sendMessage(BusMessage("recoveryrequest", "p0", "r1".getBytes))
    ctx.sendMessage(BusMessage("recoverycancelall", "all", Array.emptyByteArray))
    assert(seen.toList == List("recoveryrequest:p0", "recoverycancelall:all"))
  }

  test("ack marks a message consumed so restarts do not redeliver") {
    val (ctx, bus) = newCtx()
    val seen = collection.mutable.ListBuffer[String]()
    ctx.subscribe(Seq("recoveryrequest"), m => seen += m.key)
    ctx.sendMessage(BusMessage("recoveryrequest", "p1", "r".getBytes))
    ctx.ackMessage("recoveryrequest", "p1")
    bus.start() // replay-on-startup skips acknowledged messages
    assert(seen.isEmpty)
  }
}
