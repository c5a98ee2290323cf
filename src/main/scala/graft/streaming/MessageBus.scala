package graft.streaming

import java.nio.file.{Files, Path}
import java.util.Base64
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ListBuffer
import scala.jdk.CollectionConverters._

/** Control-plane message (reference `message/message.go:12-16`). */
final case class BusMessage(messageType: String, key: String, payload: Array[Byte])

/** At-least-once broadcast control plane with the semantics of the
  * reference's compacted-Kafka message transport
  * (`message/kafkamessagesender.go:42-79`,
  * `message/kakfamessagereceiver.go:102-236`):
  *
  *   - messages keyed `messageType-key`; latest per key wins (compaction)
  *   - `ack` writes a tombstone-ish acknowledged marker for the key
  *   - on `start()`, the history is replayed and ONLY the latest
  *     unacknowledged message per key is delivered (EOF-gated buffering)
  *   - replay is capped at `replayCap` records (reference: 50,000/partition)
  *   - delivery is at-least-once: handlers must be idempotent
  *     (`docs/messaging.md:78-82`)
  *
  * Spark has a single driver, so "broadcast to all instances" collapses
  * to driver-side delivery; persistence is an append-only JSONL file
  * compacted on start (replaces the compacted topic; survives restarts
  * the same way).
  */
trait MessageBus {
  def send(m: BusMessage): Unit
  def ack(messageType: String, key: String): Unit
  def subscribe(messageTypes: Seq[String], handler: BusMessage => Unit): Unit
  /** replay history, deliver latest-unacked per key, then go live. */
  def start(): Unit
}

final class FileMessageBus(path: Path, replayCap: Int = 50000) extends MessageBus {

  private final case class Wire(messageType: String, key: String, payloadB64: String, acknowledged: Boolean) {
    def wireKey = s"$messageType-$key"
    def render: String = {
      val t = FileMessageBus.esc(messageType); val k = FileMessageBus.esc(key)
      s"""{"messagetype":"$t","key":"$k","payload":"$payloadB64","acknowledged":$acknowledged}"""
    }
  }

  private val subscribers = TrieMap[String, ListBuffer[BusMessage => Unit]]()
  private var live = false

  override def subscribe(messageTypes: Seq[String], handler: BusMessage => Unit): Unit =
    messageTypes.foreach(t => subscribers.getOrElseUpdate(t, ListBuffer()) += handler)

  override def send(m: BusMessage): Unit = synchronized {
    append(Wire(m.messageType, m.key, Base64.getEncoder.encodeToString(m.payload), acknowledged = false))
    if (live) deliver(m) // instances receive their own sends too
  }

  override def ack(messageType: String, key: String): Unit = synchronized {
    append(Wire(messageType, key, "", acknowledged = true))
  }

  override def start(): Unit = synchronized {
    // replay to EOF first, delivering only the latest per key, unacked.
    // The replay view is CAPPED (the reference's 50k/partition replay
    // cap, kakfamessagereceiver.go:32) …
    val latest = readCompacted(capped = true)
    latest.values.filterNot(_.acknowledged).foreach { w =>
      deliver(BusMessage(w.messageType, w.key, Base64.getDecoder.decode(w.payloadB64)))
    }
    // … then compact the file in place from a FRESH, UNCAPPED read:
    //  - fresh: handlers ack/send DURING replay and those appends must
    //    survive the rewrite — compacting the pre-delivery snapshot
    //    would clobber them (acked messages redelivered forever, sent
    //    messages silently dropped from the durable log);
    //  - uncapped: the cap bounds REPLAY, not retention — rewriting
    //    only the newest replayCap lines would permanently delete older
    //    unacked requests.
    if (Files.exists(path)) {
      val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
      Files.write(tmp, readCompacted(capped = false).values.map(_.render).toList.asJava)
      Files.move(tmp, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    live = true
  }

  private def deliver(m: BusMessage): Unit =
    subscribers.getOrElse(m.messageType, Nil).foreach(h => h(m))

  private def append(w: Wire): Unit = {
    Files.createDirectories(path.toAbsolutePath.getParent)
    Files.writeString(path, w.render + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  private def readCompacted(capped: Boolean): Map[String, Wire] = {
    if (!Files.exists(path)) return Map.empty
    val all = Files.readAllLines(path).asScala
    val lines = if (capped) all.takeRight(replayCap) else all
    val re = """\{"messagetype":"(.*?)","key":"(.*?)","payload":"(.*?)","acknowledged":(true|false)\}""".r
    val latest = scala.collection.mutable.LinkedHashMap[String, Wire]()
    lines.foreach {
      case re(t, k, p, a) =>
        val w = Wire(FileMessageBus.unesc(t), FileMessageBus.unesc(k), p, a.toBoolean)
        latest(w.wireKey) = w
      case _ => // skip corrupt line
    }
    latest.toMap
  }
}

object FileMessageBus {
  // \n/\r/\t must escape too: a raw newline in a messageType or key
  // would split the JSONL record into two corrupt lines — the message
  // delivers live but is lost from replay AND dropped by compaction
  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"'  => "\\\""
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c => c.toString
  }
  // single-pass: sequential replace() would mis-decode an escaped
  // backslash followed by a literal 'n' as a newline
  private def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\')
          case '"'  => b.append('"')
          case 'n'  => b.append('\n')
          case 'r'  => b.append('\r')
          case 't'  => b.append('\t')
          case o    => b.append('\\').append(o)
        }
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
}
