package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference leader-election semantics
  * (`leader/leader.go:27-122` + `leader/leader_test.go`): ordered
  * candidacy, exactly one leader, follower promotion on leader death or
  * resignation — driven deterministically through the injectable clock.
  */
class LeaderElectionSpec extends AnyFunSuite {

  private def newDir() = Files.createTempDirectory("graft-leader")

  test("first candidate leads; the second follows; both see one leader") {
    val dir = newDir()
    var now = 1000L
    val clock = () => now
    val a = new LeaderElection(dir, "instance-a", ttlMs = 100, clock)
    val b = new LeaderElection(dir, "instance-b", ttlMs = 100, clock)
    a.start(); b.start()
    assert(a.isLeader && !b.isLeader)
    assert(a.epoch.get < b.epoch.get)
    // heartbeats keep the order stable across many evaluations
    now += 80; a.heartbeat(); b.heartbeat()
    assert(a.isLeader && !b.isLeader)
  }

  test("resignation promotes the next candidate immediately (leader.go:72-78)") {
    val dir = newDir()
    var now = 1000L
    val a = new LeaderElection(dir, "instance-a", ttlMs = 100, () => now)
    val b = new LeaderElection(dir, "instance-b", ttlMs = 100, () => now)
    a.start(); b.start()
    a.resign()
    assert(b.isLeader && !a.isLeader)
    // re-entering gets a FRESH higher seq: b keeps leading (no flap)
    a.start()
    assert(b.isLeader && !a.isLeader)
    assert(a.epoch.get > b.epoch.get) // fencing token is monotone
  }

  test("a leader that stops heartbeating expires after ttl and the follower takes over") {
    val dir = newDir()
    var now = 1000L
    val a = new LeaderElection(dir, "instance-a", ttlMs = 100, () => now)
    val b = new LeaderElection(dir, "instance-b", ttlMs = 100, () => now)
    a.start(); b.start()
    assert(a.isLeader)
    // only b heartbeats; a goes silent (process death analog = ZK
    // session expiry)
    now += 60; b.heartbeat()
    assert(a.isLeader, "within ttl the silent leader still leads")
    now += 60; b.heartbeat() // a's last beat now 120ms old > ttl
    assert(b.isLeader && !a.isLeader)
  }

  test("long-dead candidate files are garbage-collected by observers") {
    val dir = newDir()
    var now = 1000L
    val a = new LeaderElection(dir, "instance-a", ttlMs = 100, () => now)
    val b = new LeaderElection(dir, "instance-b", ttlMs = 100, () => now)
    a.start(); b.start()
    now += 500; b.heartbeat() // a is 5×ttl stale
    assert(b.isLeader)
    val names = Files.list(dir).iterator()
    val left = new scala.collection.mutable.ArrayBuffer[String]
    while (names.hasNext) left += names.next().getFileName.toString
    assert(!left.exists(_ == f"candidate-${0L}%010d"), s"stale file not GC'd: $left")
  }

  test("a GC'd candidate never resurrects its old sequence (split-brain guard)") {
    val dir = newDir()
    var now = 1000L
    val a = new LeaderElection(dir, "instance-a", ttlMs = 100, () => now)
    val b = new LeaderElection(dir, "instance-b", ttlMs = 100, () => now)
    a.start(); b.start()
    assert(a.isLeader && a.epoch.contains(0L))
    // a stalls (GC pause) until a peer garbage-collects its file and
    // promotes; a's next heartbeat must DROP enrollment, not recreate
    // candidate-0000000000 and reclaim leadership over b
    now += 500; b.heartbeat()
    assert(b.isLeader)
    a.heartbeat() // resumes after the stall
    assert(!a.isLeader && a.epoch.isEmpty, "stalled candidate resurrected its seq")
    assert(b.isLeader, "leadership flapped back to the stalled instance")
    // rejoining is a FRESH, higher sequence
    a.start()
    assert(a.epoch.exists(_ > b.epoch.get) && b.isLeader && !a.isLeader)
  }

  test("sequence allocation under contention stays unique") {
    val dir = newDir()
    val es = (1 to 8).map(i => new LeaderElection(dir, s"i$i", ttlMs = 1000))
    val threads = es.map(e => new Thread(() => e.start()))
    threads.foreach(_.start()); threads.foreach(_.join())
    val seqs = es.flatMap(_.epoch)
    assert(seqs.distinct.length == 8, seqs.toString)
    assert(es.count(_.isLeader) == 1)
  }

  test("GraftApp wires the election from leaderelectionpath and resigns on shutdown") {
    val dir = newDir()
    val spark = graft.SparkSpec.session
    val yaml =
      s"""application: leadertest
         |leaderelectionpath: $dir
         |source:
         |  name: stringsource
         |  params: {path: unused}
         |nodes:
         |  - name: filternode
         |""".stripMargin
    val app = GraftApp.fromYaml(spark, yaml).fold(e => sys.error(e), identity)
    try {
      assert(app.election.isDefined)
      assert(app.ctx.isLeader, "sole instance must lead")
      // a second app joining the same path follows
      val app2 = GraftApp.fromYaml(spark, yaml).fold(e => sys.error(e), identity)
      try assert(!app2.ctx.isLeader && app.ctx.isLeader)
      finally { // first app resigns -> second promotes
        app.shutdown()
        assert(app2.ctx.isLeader)
        app2.shutdown()
      }
    } finally app.shutdown()
  }

  test("without leaderelectionpath the driver stays the singleton (isLeader true)") {
    val spark = graft.SparkSpec.session
    val yaml =
      """application: noleader
        |source:
        |  name: stringsource
        |  params: {path: unused}
        |nodes:
        |  - name: filternode
        |""".stripMargin
    val app = GraftApp.fromYaml(spark, yaml).fold(e => sys.error(e), identity)
    assert(app.election.isEmpty && app.ctx.isLeader)
    app.shutdown()
  }
}
