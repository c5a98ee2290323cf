package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Persistent ledger of per-partition recovery ranges — the semantics
  * of the reference's `RecoveryTracker`
  * (`node/kafkaconsumer/recoverytracker.go:17-263`):
  *
  *   - add: merge with ANY overlapping existing request in place
  *     (overlap test `fromOffset <= existing.to && existing.from <= to`,
  *     `recoverytracker.go:86-96`), else append
  *   - update: checkpoint replay progress (`fromOffset` advances)
  *   - markComplete: drop the request for a partition range
  *   - cancelAll: drop everything
  *
  * Persistence: an atomically-replaced JSON file per ledger (the Spark
  * driver is the singleton, so a checkpoint-dir file replaces the
  * reference's compacted Kafka topic; it survives driver restarts the
  * same way).
  */
object RecoveryLedger {
  final case class Range(from: Long, to: Long)
}

final class RecoveryLedger(path: Option[Path] = None) {
  import RecoveryLedger.Range

  private var requests: Map[Int, List[Range]] = path.map(load).getOrElse(Map.empty)

  def partitionRequests(partition: Int): List[Range] =
    requests.getOrElse(partition, Nil)

  def all: Map[Int, List[Range]] = requests

  def requestCount: Int = requests.values.map(_.size).sum

  /** Merge-or-append, exactly the reference's in-place merge. Note the
    * reference merges into EVERY overlapping request without
    * re-coalescing the merged results with each other; we coalesce to a
    * canonical minimal set (strict superset of coverage, property
    * tested: merged ranges cover exactly the union).
    */
  def add(partition: Int, from: Long, to: Long): Unit = synchronized {
    val existing = requests.getOrElse(partition, Nil)
    val (overlapping, disjoint) = existing.partition(r => from <= r.to && r.from <= to)
    val merged = overlapping.foldLeft(Range(from, to)) { (acc, r) =>
      Range(math.min(acc.from, r.from), math.max(acc.to, r.to))
    }
    requests = requests.updated(partition, (merged :: disjoint).sortBy(_.from))
    persist()
  }

  /** Advance replay progress (`UpdateRecoveryRequest`): the range whose
    * [from,to) contains `newFrom` gets its from bumped.
    */
  def update(partition: Int, newFrom: Long): Unit = synchronized {
    requests = requests.updatedWith(partition)(_.map(_.map { r =>
      if (newFrom > r.from && newFrom <= r.to) r.copy(from = newFrom) else r
    }))
    persist()
  }

  /** `MarkRecoveryComplete`: remove the finished range. */
  def markComplete(partition: Int, to: Long): Unit = synchronized {
    requests = requests.updatedWith(partition)(_.map(_.filterNot(_.to <= to)).filter(_.nonEmpty))
    persist()
  }

  /** `cancelAll` (recoverycancelall control message). */
  def cancelAll(): Unit = synchronized {
    requests = Map.empty
    persist()
  }

  // ---- persistence ----

  private def persist(): Unit = path.foreach { p =>
    val json = requests.toSeq.sortBy(_._1).map { case (part, rs) =>
      val arr = rs.map(r => s"""{"from":${r.from},"to":${r.to}}""").mkString("[", ",", "]")
      s""""$part":$arr"""
    }.mkString("{", ",", "}")
    val tmp = Paths.get(p.toString + ".tmp")
    Files.createDirectories(p.toAbsolutePath.getParent)
    Files.writeString(tmp, json)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def load(p: Path): Map[Int, List[Range]] = {
    if (!Files.exists(p)) return Map.empty
    val json = Files.readString(p)
    // minimal parse of the flat shape written by persist()
    val partRe = """"(\d+)":\[([^\]]*)\]""".r
    val rangeRe = """\{"from":(-?\d+),"to":(-?\d+)\}""".r
    partRe.findAllMatchIn(json).map { m =>
      val ranges = rangeRe.findAllMatchIn(m.group(2)).map(r => Range(r.group(1).toLong, r.group(2).toLong)).toList
      m.group(1).toInt -> ranges
    }.toMap
  }
}
