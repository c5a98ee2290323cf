package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Decision table + properties for the capped-lag startup offsets
  * (`kafkaconsumer.go:336-384`) and recovery caps
  * (`recoveryconsumer.go:328-343`).
  */
class OffsetMathSpec extends AnyFunSuite {

  /** run a ScalaCheck property inside a funsuite test */
  protected def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  test("normal assignment: lag within cap starts at committed") {
    assert(OffsetMath.cappedStart(committed = 100, high = 150, maxLag = 100) ==
      OffsetMath.Assignment(100, None))
  }

  test("capped assignment: start at high-maxLag, recover the gap") {
    assert(OffsetMath.cappedStart(committed = 0, high = 4000, maxLag = 100) ==
      OffsetMath.Assignment(3900, Some((0, 3900))))
  }

  test("invalid committed treated as zero") {
    assert(OffsetMath.cappedStart(committed = -1001, high = 50, maxLag = 100) ==
      OffsetMath.Assignment(0, None))
  }

  test("maxLag greater than high watermark starts at zero") {
    assert(OffsetMath.cappedStart(committed = -1001, high = 50000, maxLag = 100000) ==
      OffsetMath.Assignment(0, None))
  }

  test("recovery volume cap keeps newest part of range") {
    assert(OffsetMath.capRecovery(0, 4000, 500) == (3500, 4000))
    assert(OffsetMath.capRecovery(100, 400, 500) == (100, 400))
  }

  test("rate limit to maxOffsetsPerTrigger") {
    assert(OffsetMath.recoveryMaxOffsetsPerTrigger(1500, 1000) == 1500)
    assert(OffsetMath.recoveryMaxOffsetsPerTrigger(100, 500) == 50)
    assert(OffsetMath.recoveryMaxOffsetsPerTrigger(1, 1) == 1)
  }

  test("offsets json shape") {
    assert(OffsetMath.offsetsJson("logs", Map(1 -> 50L, 0 -> 10L)) ==
      """{"logs":{"0":10,"1":50}}""")
  }

  private val gen = for {
    high <- Gen.choose(0L, 1000000L)
    committed <- Gen.choose(-1001L, high)
    maxLag <- Gen.choose(0L, 2000000L)
  } yield (committed, high, maxLag)

  test("property: start is within [0, high] and no skipped data outside recovery range") {
    checkProp(Prop.forAll(gen) { case (committed, high, maxLag) =>
      val a = OffsetMath.cappedStart(committed, high, maxLag)
      val c = math.max(committed, 0)
      val startOk = a.start >= 0 && a.start <= high
      val recoverOk = a.recover match {
        case Some((from, to)) =>
          // the recovery range is exactly the skipped interval
          from == c && to == a.start && from < to
        case None =>
          // nothing skipped: either start==committed or topic shorter than the cap
          a.start == c || a.start == 0
      }
      startOk && recoverOk
    })
  }
}
