package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot diff semantics: the four statuses, null-safe comparison,
  * changed-column attribution, and the single-join plan.
  */
class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  private def oldDf = Seq(
    (1L, "a", Some(10.0)),  // unchanged
    (2L, "b", Some(20.0)),  // value changes
    (3L, "c", None),        // null -> value: changed
    (4L, "d", Some(40.0)),  // removed
    (6L, null.asInstanceOf[String], Some(60.0)) // name null->null: unchanged
  ).toDF("id", "name", "value")

  private def newDf = Seq(
    (1L, "a", Some(10.0)),
    (2L, "b", Some(21.0)),
    (3L, "c", Some(30.0)),
    (5L, "e", Some(50.0)),  // added
    (6L, null.asInstanceOf[String], Some(60.0))
  ).toDF("id", "name", "value")

  test("statuses and changed-column attribution are exact") {
    val out = Dedup.snapshotDiff(oldDf, newDf, Seq("id"), Seq("name", "value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toList))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "unchanged", Nil),
      (2L, "changed", List("value")),
      (3L, "changed", List("value")),
      (4L, "removed", Nil),
      (5L, "added", Nil),
      (6L, "unchanged", Nil)))
  }

  test("multiple changed columns list in compareCols order") {
    val o = Seq((1L, "x", 1.0)).toDF("id", "name", "value")
    val n = Seq((1L, "y", 2.0)).toDF("id", "name", "value")
    val out = Dedup.snapshotDiff(o, n, Seq("id"), Seq("name", "value")).collect()
    assert(out.head.getString(1) == "changed")
    assert(out.head.getSeq[String](2).toList == List("name", "value"))
  }

  test("composite keys diff on the full key") {
    val o = Seq((1L, "us", 1.0), (1L, "eu", 2.0)).toDF("id", "region", "value")
    val n = Seq((1L, "us", 1.0), (1L, "ap", 3.0)).toDF("id", "region", "value")
    val out = Dedup.snapshotDiff(o, n, Seq("id", "region"), Seq("value"))
      .collect().map(r => (r.getString(1), r.getString(2))).sortBy(_._1)
    assert(out.toSeq == Seq(("ap", "added"), ("eu", "removed"), ("us", "unchanged")))
  }

  test("null-key rows classify by actual side, not inferred presence") {
    // NULL keys never join (non-null-safe equality by design), so each
    // side's null-key row stands alone — old side must read 'removed',
    // new side 'added'; key-IS-NOT-NULL inference would call both 'added'
    val o = Seq((Some(1L), "a", 1.0), (None, "oldnull", 2.0))
      .toDF("id", "name", "value")
    val n = Seq((Some(1L), "a", 1.0), (None, "newnull", 3.0))
      .toDF("id", "name", "value")
    val out = Dedup.snapshotDiff(o, n, Seq("id"), Seq("name", "value"))
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSeq
    assert(out.sortBy(_.toString) == Seq(
      (None, "added"), (None, "removed"), (Some(1L), "unchanged")).sortBy(_.toString))
  }

  test("plan is one shuffled full-outer hash join — no window, no cartesian") {
    val df = Dedup.snapshotDiff(oldDf, newDf, Seq("id"), Seq("name", "value"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("FullOuter"), s"not a full-outer join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"))
  }
}
