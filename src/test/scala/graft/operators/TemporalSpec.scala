package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TemporalSpec extends SparkSpec {

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asof join picks the latest right row at or before each left row") {
    import spark.implicits._
    val left = Seq(
      ("u1", t(5), "e1"), ("u1", t(10), "e2"), ("u1", t(20), "e3"),
      ("u2", t(1), "e4"), // before any right row → null
      ("u3", t(9), "e5")  // no right rows for key at all
    ).toDF("k", "ts", "ev")
    val right = Seq(
      ("u1", t(0), 100L), ("u1", t(10), 200L), ("u1", t(15), 300L),
      ("u2", t(2), 400L)
    ).toDF("k", "ts", "price")

    val got = Temporal.asofJoin(left, right, "k", "ts")
      .select("ev", "price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(got == Map(
      "e1" -> Some(100L), // latest ≤ 10:05 is 10:00
      "e2" -> Some(200L), // equal timestamp matches (>=)
      "e3" -> Some(300L),
      "e4" -> None,
      "e5" -> None))
  }

  test("asof join: NULL keys never match (SQL equi-join semantics)") {
    import spark.implicits._
    // Spark's Window groups NULL keys into ONE partition, so without
    // the right-side null filter a null-key left row would pick up a
    // null-key right row's values — DuckDB's ASOF (the oracle) never
    // matches NULL = NULL
    val left = Seq(
      (Option("u1"), t(10), "e1"),
      (Option.empty[String], t(10), "e2")
    ).toDF("k", "ts", "ev")
    val right = Seq(
      (Option("u1"), t(5), 100L),
      (Option.empty[String], t(5), 999L)
    ).toDF("k", "ts", "price")
    val got = Temporal.asofJoin(left, right, "k", "ts")
      .select("ev", "price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map("e1" -> Some(100L), "e2" -> None), s"got $got")
  }

  test("nearest asof picks the closer side; ties and equal timestamps go backward") {
    import spark.implicits._
    val left = Seq(
      ("u1", t(5), "e1"),   // 10:00 behind (5m) vs 10:20 ahead (15m) → backward
      ("u1", t(16), "e2"),  // 10:00 behind (16m) vs 10:20 ahead (4m) → forward
      ("u1", t(10), "e3"),  // exactly between 10:00 and 10:20 → tie → backward
      ("u1", t(20), "e4"),  // equal ts → backward frame, distance 0
      ("u2", t(7), "e5"),   // only a forward row exists
      ("u3", t(7), "e6")    // no right rows → null
    ).toDF("k", "ts", "ev")
    val right = Seq(
      ("u1", t(0), 100L), ("u1", t(20), 200L),
      ("u2", t(9), 300L)
    ).toDF("k", "ts", "price")
    val got = Temporal.asofJoin(left, right, "k", "ts", direction = "nearest")
      .select("ev", "price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(
      "e1" -> Some(100L), "e2" -> Some(200L), "e3" -> Some(100L),
      "e4" -> Some(200L), "e5" -> Some(300L), "e6" -> None), s"got $got")
    // tolerance bounds the |distance| in nearest mode too
    val tol = Temporal.asofJoin(left, right, "k", "ts",
        toleranceSeconds = Some(300L), direction = "nearest")
      .select("ev", "price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(tol("e1") == Some(100L) && tol("e2") == Some(200L))
    assert(tol("e3") == None, "10-minute distance must exceed the 5-minute tolerance")
  }

  test("range join equals brute-force containment across bucket boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // intervals straddling bucket edges, zero-length, and overlapping
    val intervals = Seq(
      (1L, t(0), t(59)),   // spans 2 buckets at 1800s grain
      (2L, t(10), t(10)),  // zero-length
      (3L, t(25), t(45))   // overlaps interval 1
    ).toDF("i_id", "start_ts", "end_ts")
    val points = Seq((10L, t(0)), (11L, t(10)), (12L, t(30)), (13L, t(50)), (14L, t(59)))
      .toDF("p_id", "ts")

    val got = Temporal.rangeJoin(points, "ts", intervals, "start_ts", "end_ts", 1800L)
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = points.join(intervals,
        col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    assert(got.contains((11L, 2L)) && got.contains((12L, 3L)) && got.contains((14L, 1L)))
    // no duplicate pairs from the interval explosion
    val rows = Temporal.rangeJoin(points, "ts", intervals, "start_ts", "end_ts", 1800L).count()
    assert(rows == got.size)
  }

  test("interval overlap join equals brute force, each pair exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val l = Seq(
      (1L, t(0), t(30)),   // overlaps r1, r2 (boundary-touching), r3
      (2L, t(40), t(45)),  // overlaps r3 only
      (3L, t(50), t(55))   // overlaps nothing
    ).toDF("l_id", "l_s", "l_e")
    val r = Seq(
      (10L, t(5), t(10)),   // inside l1
      (11L, t(30), t(35)),  // touches l1's end exactly (closed intervals)
      (12L, t(25), t(44))   // spans l1's tail and l2
    ).toDF("r_id", "r_s", "r_e")
    val got = Temporal.intervalOverlapJoin(l, "l_s", "l_e", r, "r_s", "r_e", 600L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    val brute = l.crossJoin(r)
      .filter(col("l_s") <= col("r_e") && col("r_s") <= col("l_e"))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.sorted.toSeq == brute.sorted.toSeq, s"got ${got.toSeq} want ${brute.toSeq}")
    // exactly-once: no duplicate pairs despite shared buckets
    assert(got.length == got.distinct.length)
    assert(got.toSet == Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 12L)))
  }

  test("giant-interval guard: capped results identical, giants broadcast instead of exploding") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // one degenerate interval spanning ~14 years of 1800s buckets: with
    // the cap it must NOT be bucket-exploded (245k replicas) but still
    // match every point via the broadcast side-channel
    val giantLo = new Timestamp(0L)
    val giantHi = new Timestamp(2_000_000_000_000L) // epoch 0 .. 2033 — ~1.1M buckets
    val intervals = Seq(
      (1L, t(0), t(59)),
      (2L, t(10), t(10)),
      (99L, giantLo, giantHi)  // the giant
    ).toDF("i_id", "start_ts", "end_ts")
    val points = Seq((10L, t(0)), (11L, t(10)), (12L, t(30))).toDF("p_id", "ts")
    def pairs(capped: Option[Long]) =
      Temporal.rangeJoin(points, "ts", intervals, "start_ts", "end_ts", 1800L, capped)
        .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs(Some(64L))
    // every point matches the giant; normal matches unchanged
    assert(capped == pairs(None))
    assert(Set((10L, 99L), (11L, 99L), (12L, 99L)).subsetOf(capped))
    // the capped plan never materializes the giant's bucket sequence:
    // it must run a broadcast join for the giant branch
    val plan = Temporal.rangeJoin(points, "ts", intervals, "start_ts", "end_ts", 1800L, Some(64L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"giant side-channel not broadcast:\n$plan")

    // interval×interval: giants on BOTH sides, every pair exactly once
    val l = Seq((1L, t(0), t(30)), (2L, t(40), t(45)), (50L, giantLo, giantHi))
      .toDF("l_id", "l_s", "l_e")
    val r = Seq((10L, t(5), t(10)), (11L, t(30), t(35)), (60L, giantLo, giantHi))
      .toDF("r_id", "r_s", "r_e")
    val got = Temporal.intervalOverlapJoin(l, "l_s", "l_e", r, "r_s", "r_e", 600L, Some(64L))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    val brute = l.crossJoin(r)
      .filter(col("l_s") <= col("r_e") && col("r_s") <= col("l_e"))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.sorted.toSeq == brute.sorted.toSeq, s"got ${got.toSeq} want ${brute.toSeq}")
    assert(got.length == got.distinct.length, "a pair was emitted twice under the cap")
  }

  test("range and overlap joins accept inputs sharing column names") {
    import spark.implicits._
    // both sides carry start/end — the predicate must qualify per side
    val l = Seq((1L, t(0), t(30))).toDF("id", "start", "end")
    val r = Seq((9L, t(10), t(20))).toDF("id", "start", "end")
    val ov = Temporal.intervalOverlapJoin(l, "start", "end", r, "start", "end", 600L)
    assert(ov.count() == 1)
    val pts = Seq((7L, t(15))).toDF("id", "ts")
    val iv = Seq((8L, t(0), t(30))).toDF("id", "start", "end")
    assert(Temporal.rangeJoin(pts, "ts", iv, "start", "end", 1800L).count() == 1)
  }

  test("a legit NULL in the matched right row is NOT back-filled from older rows") {
    import spark.implicits._
    val left = Seq(("k", t(10), "e")).toDF("k", "ts", "ev")
    // latest right row (10:05) has tag = NULL; the older row's "a" must
    // not leak into the match — the right row is carried as a unit
    val right = Seq(("k", t(1), 1L, Option("a")), ("k", t(5), 2L, Option.empty[String]))
      .toDF("k", "ts", "v", "tag")
    val row = Temporal.asofJoin(left, right, "k", "ts").collect().head
    assert(row.getAs[Long]("v") == 2L)
    assert(row.isNullAt(row.fieldIndex("tag")), "NULL in matched row was back-filled")
  }

  test("overlapping non-key column names are rejected") {
    import spark.implicits._
    val left = Seq(("k", t(10), 1L)).toDF("k", "ts", "v")
    val right = Seq(("k", t(1), 2L)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] { Temporal.asofJoin(left, right, "k", "ts") }
  }

  test("left rows and columns are preserved; multiple right columns carry together") {
    import spark.implicits._
    val left = Seq(("k", t(10), 7)).toDF("k", "ts", "n")
    val right = Seq(("k", t(1), 1L, "a"), ("k", t(5), 2L, "b")).toDF("k", "ts", "v", "tag")
    val row = Temporal.asofJoin(left, right, "k", "ts").collect().head
    val bySchema = Temporal.asofJoin(left, right, "k", "ts").columns.toList
    assert(bySchema == List("k", "ts", "n", "v", "tag"))
    assert(row.getAs[Int]("n") == 7 && row.getAs[Long]("v") == 2L && row.getAs[String]("tag") == "b")
  }
}
