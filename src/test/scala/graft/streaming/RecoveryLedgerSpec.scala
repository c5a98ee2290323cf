package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import RecoveryLedger.Range

/** Ledger semantics of the reference's RecoveryTracker
  * (`recoverytracker.go:72-109` merge, `:140-180` update/complete) plus
  * the property the reference never tests: merged ranges cover exactly
  * the union of everything inserted.
  */
class RecoveryLedgerSpec extends AnyFunSuite {

  test("disjoint requests accumulate") {
    val l = new RecoveryLedger()
    l.add(0, 0, 10)
    l.add(0, 20, 30)
    assert(l.partitionRequests(0) == List(Range(0, 10), Range(20, 30)))
    assert(l.requestCount == 2)
  }

  test("overlapping requests merge in place") {
    val l = new RecoveryLedger()
    l.add(0, 0, 10)
    l.add(0, 5, 15)
    assert(l.partitionRequests(0) == List(Range(0, 15)))
  }

  test("touching ranges merge (from <= existing.to)") {
    val l = new RecoveryLedger()
    l.add(0, 0, 10)
    l.add(0, 10, 20)
    assert(l.partitionRequests(0) == List(Range(0, 20)))
  }

  test("bridge range coalesces multiple existing requests") {
    val l = new RecoveryLedger()
    l.add(0, 0, 10)
    l.add(0, 20, 30)
    l.add(0, 5, 25) // overlaps both
    assert(l.partitionRequests(0) == List(Range(0, 30)))
  }

  test("partitions are independent") {
    val l = new RecoveryLedger()
    l.add(0, 0, 10)
    l.add(1, 5, 15)
    assert(l.partitionRequests(0) == List(Range(0, 10)))
    assert(l.partitionRequests(1) == List(Range(5, 15)))
  }

  test("update advances progress, markComplete removes") {
    val l = new RecoveryLedger()
    l.add(2, 100, 500)
    l.update(2, 300)
    assert(l.partitionRequests(2) == List(Range(300, 500)))
    l.markComplete(2, 500)
    assert(l.partitionRequests(2).isEmpty)
  }

  test("cancelAll clears everything") {
    val l = new RecoveryLedger()
    l.add(0, 0, 10); l.add(1, 0, 10)
    l.cancelAll()
    assert(l.requestCount == 0)
  }

  test("persistence roundtrip survives restart") {
    val dir = Files.createTempDirectory("ledger")
    val path = dir.resolve("ledger.json")
    val l = new RecoveryLedger(Some(path))
    l.add(0, 0, 10); l.add(3, 700, 900); l.add(0, 50, 80)
    val reloaded = new RecoveryLedger(Some(path))
    assert(reloaded.all == l.all)
  }

  test("property: ledger ranges are disjoint, sorted, and cover exactly the inserted union") {
    val rangesGen = Gen.listOfN(30, for {
      from <- Gen.choose(0L, 200L)
      len <- Gen.choose(1L, 40L)
    } yield (from, from + len))
    val prop = Prop.forAll(rangesGen) { ranges =>
      val l = new RecoveryLedger()
      ranges.foreach { case (f, t) => l.add(0, f, t) }
      val rs = l.partitionRequests(0)
      val sortedDisjoint = rs.sliding(2).forall {
        case List(a, b) => a.to < b.from // strictly disjoint, non-touching
        case _ => true
      }
      def covered(x: Long, in: List[(Long, Long)]) = in.exists { case (f, t) => x >= f && x <= t }
      // sample coverage equivalence over the domain
      val equalCoverage = (0L to 250L).forall { x =>
        covered(x, ranges) == covered(x, rs.map(r => (r.from, r.to)))
      }
      sortedDisjoint && equalCoverage
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
