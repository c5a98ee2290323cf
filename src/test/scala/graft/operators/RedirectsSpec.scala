package graft.operators

import graft.SparkSpec

/** Pins the [[Redirects.resolve]] contract on handcrafted graphs: the
  * pointer-jumping arithmetic (hops = original edges traversed), the
  * deterministic cycle surface (terminal=false, hops = 2^rounds), the
  * min-dst collapse for conflicting captures, and the 2^rounds reach
  * bound. The corpus-facing oracle (`ta_warc_redirect`) binds the
  * WARC-integrated chain end-to-end.
  */
class RedirectsSpec extends SparkSpec {

  private def resolve(rounds: Int, edges: (String, String)*): Map[String, (String, Long, Boolean)] = {
    import spark.implicits._
    Redirects.resolve(edges.toDF("src", "dst"), rounds, graphPartitions = 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  test("a chain resolves every suffix: hops counts original edges") {
    val out = resolve(3, "a" -> "b", "b" -> "c", "c" -> "T")
    assert(out == Map(
      "a" -> (("T", 3L, true)),
      "b" -> (("T", 2L, true)),
      "c" -> (("T", 1L, true))))
  }

  test("pointer jumping reaches 2^rounds hops; one hop past the bound stays unresolved") {
    // 8-hop chain with rounds=3 (reach exactly 8) resolves fully
    val chain8 = (0 until 8).map(i => s"n$i" -> s"n${i + 1}")
    val ok = resolve(3, chain8: _*)
    assert(ok("n0") == (("n8", 8L, true)))
    // 9-hop chain: the head can't reach the terminal in 3 rounds
    val chain9 = (0 until 9).map(i => s"n$i" -> s"n${i + 1}")
    val cut = resolve(3, chain9: _*)
    assert(cut("n0")._3 == false)
    assert(cut("n1") == (("n9", 8L, true)))
  }

  test("cycles surface deterministically: terminal=false, hops = 2^rounds") {
    val out = resolve(3, "a" -> "b", "b" -> "a", "s" -> "s")
    assert(out("a") == (("a", 8L, false)))
    assert(out("b") == (("b", 8L, false)))
    assert(out("s") == (("s", 8L, false))) // self-redirect
  }

  test("conflicting captures of one source collapse to the bytewise-smallest target") {
    val out = resolve(2, "a" -> "z", "a" -> "m", "m" -> "T")
    assert(out("a") == (("T", 2L, true)))
  }

  test("a chain feeding a cycle stays unresolved but keeps following pointers") {
    val out = resolve(3, "in" -> "a", "a" -> "b", "b" -> "a")
    assert(out("in")._3 == false)
  }

  test("applyResolution: terminal sources re-key, cycles and unknowns keep their own key") {
    import spark.implicits._
    val res = Redirects.resolve(
      Seq("old" -> "mid", "mid" -> "fin", "ca" -> "cb", "cb" -> "cc", "cc" -> "ca")
        .toDF("src", "dst"), rounds = 3, graphPartitions = 2)
    val pages = Seq(1L -> "fin", 2L -> "old", 3L -> "mid", 4L -> "ca", 5L -> "other")
      .toDF("doc_id", "url_canon")
    val out = Redirects.applyResolution(pages, res)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> (("fin", 0L)),   // the target itself: untouched
      2L -> (("fin", 2L)),   // 2-hop historical spelling collapses
      3L -> (("fin", 1L)),   // mid-chain spelling collapses too
      4L -> (("ca", 0L)),    // cycle member: terminal=false gates the re-key
      5L -> (("other", 0L)))) // never a redirect source
  }

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[String, (String, Long, Boolean)] =
    df.collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("resolveIncremental equals the full recompute on the bounded frame, hops included") {
    import spark.implicits._
    val oldE = Seq("a" -> "b", "b" -> "c", "c" -> "T", // 3-hop chain
      "p" -> "Q") // 1-hop chain whose terminal a new edge extends
    val newE = Seq(
      "n2" -> "n1", "n1" -> "a", // new 2-segment chain feeding the old chain
      "Q" -> "Z", // old final_dst becomes a redirect source (extension)
      "f" -> "G") // fresh independent terminal
    val resolved = Redirects.resolve(oldE.toDF("src", "dst"), rounds = 3, graphPartitions = 2)
    val inc = asMap(Redirects.resolveIncremental(
      newE.toDF("src", "dst"), resolved, rounds = 3, graphPartitions = 2))
    val full = asMap(Redirects.resolve(
      (oldE ++ newE).toDF("src", "dst"), rounds = 3, graphPartitions = 2))
    assert(inc == full)
    assert(inc("n2") == (("T", 5L, true))) // 2 new hops + 3 compressed old
    assert(inc("p") == (("Z", 2L, true))) // old terminal extended through the delta
  }

  test("resolveIncremental: old cycles pass through; a new chain into one flags, never spins") {
    import spark.implicits._
    val resolved = Redirects.resolve(
      Seq("ca" -> "cb", "cb" -> "ca").toDF("src", "dst"), rounds = 3, graphPartitions = 2)
    val inc = asMap(Redirects.resolveIncremental(
      Seq("n" -> "ca").toDF("src", "dst"), resolved, rounds = 3, graphPartitions = 2))
    assert(inc("ca") == (("ca", 8L, false)) && inc("cb") == (("cb", 8L, false)))
    // new-segment hops only: the cycle names no destination to count to
    assert(inc("n") == (("ca", 1L, false)))
  }

  test("resolveIncremental ignores re-captured sources: the old resolution wins") {
    import spark.implicits._
    val resolved = Redirects.resolve(
      Seq("a" -> "b").toDF("src", "dst"), rounds = 2, graphPartitions = 2)
    val inc = asMap(Redirects.resolveIncremental(
      Seq("a" -> "zz").toDF("src", "dst"), resolved, rounds = 2, graphPartitions = 2))
    assert(inc == Map("a" -> (("b", 1L, true))))
  }

  test("null-keyed edges drop: no silently-'resolved' row with a null destination") {
    import spark.implicits._
    val edges = Seq(
      (Some("a"), Some("T")),
      (Some("bad"), None),          // only recorded dst is null → no output row
      (None, Some("x"))             // null source is not a key
    ).toDF("src", "dst")
    val out = Redirects.resolve(edges, rounds = 2, graphPartitions = 2).collect()
    assert(out.map(_.getString(0)).toSet == Set("a"))
    assert(out.forall(r => r.getString(1) != null))
  }
}
