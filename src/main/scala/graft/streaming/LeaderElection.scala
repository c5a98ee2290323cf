package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Multi-instance leader election over a shared directory — the port of
  * the reference's ZooKeeper election (`leader/leader.go:27-122`, which
  * wraps the classic ZK leader recipe: sequential ephemeral znodes,
  * lowest sequence leads, followers promote when predecessors vanish).
  *
  * Spark deployments rarely carry a ZK quorum, but every multi-driver
  * deployment that needs coordination already shares storage (the
  * checkpoint dir: HDFS, NFS, a POSIX mount). The same recipe maps onto
  * it directly:
  *
  *   - sequential znode   → `candidate-<seq>` file, allocated by atomic
  *     create-if-absent (losers of a seq race retry with the next seq)
  *   - ephemerality       → a heartbeat timestamp INSIDE the file,
  *     rewritten via atomic tmp+move; a candidate whose timestamp is
  *     older than `ttlMs` is dead (analog of ZK session expiry)
  *   - leadership         → lowest-seq LIVE candidate
  *   - Resign/Shutdown    → delete own file (`leader.go:72-78`)
  *
  * [[isLeader]] re-reads the directory (a handful of tiny files — this
  * is control-plane, called per micro-batch at most) so leadership
  * reflects the shared truth, not a cached flag; the reference instead
  * caches status updates pushed by ZK watches, which shared storage
  * cannot push. Files staler than 2×`ttlMs` are garbage-collected by
  * whoever observes them.
  *
  * Fencing: [[epoch]] (the own sequence number) is monotone across
  * successive leaderships while candidate files persist — a new
  * candidate always allocates above every seq it can still observe.
  * After a full directory GC plus simultaneous death of all candidates,
  * seqs can restart; consumers needing absolute fencing should combine
  * the epoch with the instance id. REQUIRES atomic create-if-absent on
  * the shared store (POSIX, NFSv4, HDFS — not eventually-consistent
  * object stores).
  *
  * `clock` is injectable so specs drive expiry deterministically.
  */
final class LeaderElection(
    dir: Path,
    val instanceId: String,
    ttlMs: Long = 10000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  require(ttlMs > 0, s"leader election ttlMs must be positive, got $ttlMs")

  private val Name = "candidate-([0-9]{10})".r
  @volatile private var own: Option[Path] = None
  @volatile private var heartbeater: Option[Thread] = None
  /** set by shutdown() BEFORE the daemon is interrupted so a daemon
    * blocked at the lock cannot re-enroll a zombie candidate after the
    * resign — a fresh start() re-arms. */
  @volatile private var stopping = false

  private def seqOf(p: Path): Option[Long] = p.getFileName.toString match {
    case Name(s) => Some(s.toLong)
    case _ => None
  }

  private def candidates(): List[(Long, Path)] =
    if (!Files.isDirectory(dir)) Nil
    else {
      // Files.list holds a directory handle until closed — isLeader
      // runs per micro-batch, and leaked fds accumulate until ulimit
      val s = Files.list(dir)
      try s.iterator().asScala.toList
        .flatMap(p => seqOf(p).map(_ -> p)).sortBy(_._1)
      finally s.close()
    }

  /** heartbeat millis recorded in a candidate file; None if unreadable
    * (mid-replace on a non-atomic store, or concurrently deleted) —
    * unreadable counts as live for one ttl rather than falsely dead. */
  private def tsOf(p: Path): Option[Long] =
    try {
      val lines = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).split('\n')
      if (lines.length >= 2) Some(lines(1).trim.toLong) else None
    } catch { case NonFatal(_) => None }

  private def writeOwn(p: Path): Unit =
    // NON-CREATE write: a candidate whose file was GC'd by a peer must
    // never recreate it — a tmp+move refresh could resurrect an old
    // (possibly leading) sequence after a GC pause, giving two
    // simultaneous leaders (the check-then-move TOCTOU). Write-without-
    // CREATE cannot recreate: if the file is gone it throws
    // NoSuchFileException and the candidate drops out (ZK session-loss
    // semantics). A torn concurrent read is benign — tsOf counts an
    // unreadable file as live for one ttl. This also removes the
    // tmp-file litter and the ATOMIC_MOVE-unsupported failure mode of
    // the previous implementation.
    Files.write(p, s"$instanceId\n${clock()}\n".getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)

  /** Enter the election: allocate the next free sequence atomically and
    * write the first heartbeat. Idempotent while enrolled. */
  def start(): Unit = synchronized {
    stopping = false // an explicit (re-)start re-arms the election
    enroll()
  }

  private def enroll(): Unit =
    if (own.isEmpty) {
      Files.createDirectories(dir)
      var seq = candidates().lastOption.fold(0L)(_._1 + 1)
      var acquired: Option[Path] = None
      while (acquired.isEmpty) {
        val p = dir.resolve(f"candidate-$seq%010d")
        try {
          // atomic claim; losers move to the next seq. The first
          // heartbeat content is written right here — heartbeat()'s
          // non-CREATE write needs the file to exist with content
          Files.write(p, s"$instanceId\n${clock()}\n".getBytes(StandardCharsets.UTF_8),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          acquired = Some(p)
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => seq += 1
        }
      }
      own = acquired
    }

  /** Refresh this candidate's liveness timestamp. A candidate whose
    * file was garbage-collected by a peer has EXPIRED (ZK session loss,
    * `leader.go:85-91`): it does not resurrect its old — possibly
    * leading — sequence; it drops out, and the heartbeat daemon
    * re-enters the election with a fresh seq, like the reference's
    * startElection retry loop (`leader.go:57-70`). */
  def heartbeat(): Unit = synchronized {
    own.foreach { p =>
      try writeOwn(p)
      catch {
        case _: java.nio.file.NoSuchFileException => own = None // GC'd: expired
        case NonFatal(_) => () // transient I/O: next beat retries; ttl gives slack
      }
    }
  }

  /** Lowest-sequence live candidate wins. False when not enrolled —
    * and false for a candidate whose OWN heartbeat is stale: a leader
    * that could not beat within the ttl must assume a peer has already
    * promoted (the split-brain guard ZK gets from session expiry). */
  def isLeader: Boolean = leaderSeq().exists(s => own.flatMap(seqOf).contains(s))

  /** Own sequence number — the fencing token while leading. */
  def epoch: Option[Long] = own.flatMap(seqOf)

  private def leaderSeq(): Option[Long] = {
    val now = clock()
    val live = candidates().filter { case (_, p) =>
      tsOf(p) match {
        case Some(ts) if now - ts > 2 * ttlMs =>
          // long-dead: GC (ZK does this implicitly on session expiry)
          try Files.deleteIfExists(p) catch { case NonFatal(_) => () }
          false
        case Some(ts) => now - ts <= ttlMs
        case None =>
          // unreadable (mid-replace, or an empty claim from a crashed
          // start()): live until its mtime is 2×ttl stale, then GC —
          // it must not block the election forever
          val mt = try Files.getLastModifiedTime(p).toMillis
                   catch { case NonFatal(_) => now }
          if (now - mt > 2 * ttlMs) {
            try Files.deleteIfExists(p) catch { case NonFatal(_) => () }
            false
          } else true
      }
    }
    live.headOption.map(_._1)
  }

  /** Leave the election (`leader.go:72-78`): delete the candidate file
    * so followers promote immediately. Re-entering via [[start]] gets a
    * fresh, higher sequence. */
  def resign(): Unit = synchronized {
    own.foreach(p => try Files.deleteIfExists(p) catch { case NonFatal(_) => () })
    own = None
  }

  /** Background heartbeats every `ttlMs / 3` (daemon thread). */
  def startHeartbeats(): Unit = synchronized {
    if (heartbeater.isEmpty) {
      val t = new Thread(() => {
        try while (!stopping && !Thread.currentThread().isInterrupted) {
          Thread.sleep(math.max(1L, ttlMs / 3))
          // expired → rejoin fresh; guarded against a concurrent
          // shutdown so the daemon cannot re-enroll a zombie candidate
          if (own.isEmpty) synchronized { if (!stopping) enroll() }
          else heartbeat()
        } catch { case _: InterruptedException => () }
      }, s"graft-leader-heartbeat-$instanceId")
      t.setDaemon(true)
      t.start()
      heartbeater = Some(t)
    }
  }

  def shutdown(): Unit = synchronized {
    stopping = true // before the interrupt: see the field note
    heartbeater.foreach(_.interrupt())
    heartbeater = None
    resign()
  }
}
