package graft.functions

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Pins the BPE kernel to an independent straight-from-the-rule
  * reference (lowest rank wins, leftmost on ties, one merge per step,
  * codepoint init) on random texts and random merge tables — including
  * beyond-BMP codepoints, where UTF-16-unit splitting would diverge.
  */
class BpeSpec extends SparkSpec {

  private val params = Parameters.default.withMinSuccessfulTests(200)
  private def holds(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  /** naive reference: immutable-List rewrite per step. */
  private def refWord(word: String, ranks: Map[String, Int]): List[String] = {
    var toks: List[String] = {
      val b = List.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.result()
    }
    var continue = true
    while (continue && toks.length > 1) {
      val ranked = toks.zip(toks.tail).zipWithIndex
        .flatMap { case ((a, b), i) => ranks.get(a + " " + b).map(r => (r, i)) }
      if (ranked.isEmpty) continue = false
      else {
        val (_, i) = ranked.min // (rank, position): lowest rank, then leftmost
        toks = toks.take(i) ::: (toks(i) + toks(i + 1)) :: toks.drop(i + 2)
      }
    }
    toks
  }

  private def refCount(text: String, ranks: Map[String, Int]): Long =
    text.split("\\s+").filter(_.nonEmpty).map(refWord(_, ranks).length.toLong).sum

  private def toJava(m: Map[String, Int]): Bpe.Ranks = {
    val j = new java.util.HashMap[String, Integer]()
    m.foreach { case (k, v) => j.put(k, v) }
    j
  }

  // words over a small alphabet plus beyond-BMP codepoints (surrogate
  // pairs in UTF-16) so codepoint-vs-code-unit bugs can't hide
  private val hi = Gen.oneOf("😀", "🤖", "中", "文")
  private val ch = Gen.frequency(8 -> Gen.oneOf("a", "b", "c", "d").map(identity[String]), 2 -> hi)
  private val word = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, ch).map(_.mkString))
  private val text = Gen.listOf(word).map(_.mkString(" "))
  private val rankTable: Gen[Map[String, Int]] = for {
    n <- Gen.choose(0, 12)
    pairs <- Gen.listOfN(n, for { a <- ch; b <- ch } yield a + " " + b)
  } yield pairs.distinct.zipWithIndex.toMap

  test("count kernel matches the reference rule on random texts and tables") {
    holds(Prop.forAll(text, rankTable) { (t, m) =>
      Bpe.countEval(UTF8String.fromString(t), toJava(m)) == refCount(t, m)
    })
  }

  test("pieces are lossless: concatenation rebuilds the whitespace-stripped text") {
    holds(Prop.forAll(text, rankTable) { (t, m) =>
      val pieces = Bpe.piecesEval(UTF8String.fromString(t), toJava(m))
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString)
      pieces.mkString == t.split("\\s+").filter(_.nonEmpty).mkString &&
        pieces.length == Bpe.countEval(UTF8String.fromString(t), toJava(m))
    })
  }

  test("unmergeable multi-byte text counts codepoints, not UTF-16 units") {
    val empty = new java.util.HashMap[String, Integer]()
    // two emoji (2 codepoints, 4 UTF-16 units) + CJK word of 3 codepoints
    assert(Bpe.countEval(UTF8String.fromString("😀🤖"), empty) == 2L)
    assert(Bpe.countEval(UTF8String.fromString("中文语"), empty) == 3L)
    assert(Bpe.countEval(UTF8String.fromString(""), empty) == 0L)
    assert(Bpe.countEval(UTF8String.fromString("   "), empty) == 0L)
  }

  test("shipped merge table loads, and known words split as trained") {
    val r = Bpe.defaultRanks
    assert(r.size >= 1000, s"expected a production-sized merge table, got ${r.size} entries")
    def pieces(w: String): Seq[String] =
      Bpe.piecesEval(UTF8String.fromString(w), r)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    // frequent corpus words merge to whole-word tokens at 1024 merges
    assert(pieces("table") == Seq("table"), pieces("table").toString)
    assert(pieces("the") == Seq("the"), pieces("the").toString)
    // structured ids split at the trained subword boundaries
    assert(pieces("Customer#000000001") == Seq("Customer#0000", "0000", "1"),
      pieces("Customer#000000001").toString)
    // out-of-alphabet scripts degrade to per-codepoint tokens
    assert(pieces("中文") == Seq("中", "文"), pieces("中文").toString)
  }

  test("parseMerges skips headers and blank lines; rank is line order") {
    val r = Bpe.parseMerges(Iterator("#version: 0.2", "", "a b", "ab c", "  "))
    assert(r.size == 2 && r.get("a b") == 0 && r.get("ab c") == 1)
  }

  test("marked pieces detokenize losslessly; chunkBpe cuts mid-word") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // under an EMPTY merge table 'the' is 3 codepoint pieces, so a chunk
    // boundary at stride 4 with 3-piece words must fall inside a word
    // (explicit table: the shipped one now merges 'the' whole)
    val noMerges = toJava(Map.empty)
    val textVal = Seq.fill(10)("the").mkString(" ")
    val df = Seq((1L, textVal)).toDF("doc_id", "text")
    // kernel-level lossless detokenization of the full piece stream
    val detok = df.select(
      trim(translate(array_join(Bpe.markedPieces($"text", noMerges), ""), "▁", " ")).as("t"))
      .head().getString(0)
    assert(detok == textVal, s"detok mismatch: $detok")
    val chunks = graft.operators.Chunking.chunkBpe(df, "doc_id", "text",
        chunkSize = 4, overlap = 0, ranks = noMerges)
      .orderBy("chunk_idx")
      .select("chunk_text", "n_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // overlap 0: chunks partition the 30 pieces, so counts sum exactly
    assert(chunks.map(_._2).sum == 30L, chunks.toList.toString)
    // boundary falls mid-word: piece 5 starts chunk 1 inside a word,
    // so its text starts with a word FRAGMENT (no leading marker)
    assert(chunks(1)._1.startsWith("h") || chunks(1)._1.startsWith("e"),
      s"expected a mid-word start: '${chunks(1)._1}'")
    // every fragment still reads back: piece streams concatenate to the
    // full normalized text when joined marker-aware
    val rebuilt = chunks.map(_._1).mkString(" ")
    assert(rebuilt.filterNot(_ == ' ') == textVal.filterNot(_ == ' '),
      s"characters lost across chunk boundaries: $rebuilt")
  }

  test("detokenize is the exact inverse of markedPieces for spaced text") {
    import spark.implicits._
    val cases = Seq(
      "the quick brown fox",
      "a",
      "",                       // empty stays empty
      "naïve café ß 漢字 mix")  // multi-byte codepoints survive
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val out = df.select($"text",
        Bpe.detokenize(Bpe.markedPieces($"text")).as("back"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    out.foreach { case (orig, back) => assert(back == orig, s"'$orig' -> '$back'") }
  }

  test("detokenize is lossless on mid-word piece slices (chunkBpe's shape)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{slice, size}
    // every suffix slice of the marked pieces must detokenize without
    // losing its first codepoint — a slice starting mid-word has no
    // leading marker to strip (the old substr(2) recipe ate 'i' of
    // 'ing')
    val df = Seq((1L, "housing market with standing reservations")).toDF("id", "text")
    val pieces = Bpe.markedPieces($"text")
    val n = df.select(size(pieces)).head().getInt(0)
    for (start <- 1 to n) {
      val back = df.select(Bpe.detokenize(slice(pieces, start, n)).as("t")).head().getString(0)
      assert(!back.startsWith(" ") && back.nonEmpty, s"slice@$start -> '$back'")
      // no codepoint may be lost: ignoring word boundaries, the slice's
      // text must be an exact suffix of the document's text
      assert("housingmarketwithstandingreservations".endsWith(back.replace(" ", "")),
        s"slice@$start lost content: '$back'")
    }
  }

  test("piece ids: codepoints for singles, rank-offset for merges, count-consistent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "the table 漢 zq")).toDF("doc_id", "text")
    val row = df.select(
        Bpe.pieceIds($"text").as("ids"),
        Bpe.pieces($"text").as("ps"),
        Bpe.tokenCount($"text").as("n"))
      .head()
    val ids = row.getSeq[Long](0)
    val ps = row.getSeq[String](1)
    assert(ids.length == row.getLong(2) && ids.length == ps.length)
    // ids and pieces are positionally consistent under the documented rule
    val idMap = Bpe.idMapOf(Bpe.defaultRanks)
    ps.zip(ids).foreach { case (p, id) =>
      if (p.codePointCount(0, p.length) == 1)
        assert(id == p.codePointAt(0).toLong, s"'$p' -> $id")
      else {
        assert(id >= 0x110000L, s"merged piece '$p' got codepoint-range id $id")
        assert(id == idMap.get(p).longValue, s"'$p' -> $id")
      }
    }
    // the two ranges cannot collide: codepoints < 0x110000 <= merge ids
    assert(ids.forall(i => i >= 0))
  }

  test("distributed training reproduces the shipped merge table from the corpus") {
    // the shipped 1024-merge table trains on the sf0.1 union corpus
    // (documents.text + part names/types + customer names + event
    // props). Greedy BPE is prefix-stable — merge k depends only on
    // merges 1..k-1 — so training the first 48 merges must reproduce
    // the shipped table's prefix byte-for-byte; the full-table
    // reproduction is the same loop with numMerges = 1024.
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.1"
    val corpus = spark.read.parquet(s"$dir/documents.parquet").select(col("text"))
      .union(spark.read.parquet(s"$dir/part.parquet").select(col("p_name").as("text")))
      .union(spark.read.parquet(s"$dir/part.parquet").select(col("p_type").as("text")))
      .union(spark.read.parquet(s"$dir/customer.parquet").select(col("c_name").as("text")))
      .union(spark.read.parquet(s"$dir/events.parquet").select(col("props").as("text")))
    val trained = Bpe.train(corpus, "text", numMerges = 48)
    val shipped = Bpe.orderedMerges(Bpe.defaultRanks).take(48)
    assert(trained == shipped,
      s"retraining diverged from the shipped table:\n${trained.zip(shipped).filter(p => p._1 != p._2)}")
  }

  test("training stops when no pair repeats; tie-break is deterministic") {
    import spark.implicits._
    // every word unique, all pair counts 1 → zero merges
    val unique = Seq("ab", "cd", "ef").toDF("text")
    assert(Bpe.train(unique, "text", numMerges = 10).isEmpty)
    // 'ab' and 'ba' both appear twice; ("a","b") < ("b","a") wins first
    val tied = Seq("ab ba", "ab ba").toDF("text")
    assert(Bpe.train(tied, "text", numMerges = 1) == Seq("a b"))
  }

  test("SQL registration: graft_bpe_count equals the Column API") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq("the table Customer#000000001", "", "spark stream").toDF("text")
    df.createOrReplaceTempView("bpe_docs")
    val viaSql = spark.sql("SELECT graft_bpe_count(text) AS n FROM bpe_docs")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(Bpe.tokenCount($"text").as("n"))
      .collect().map(_.getLong(0)).toSeq
    // the + table (whole words) + the 3-piece structured id = 5
    assert(viaSql == viaCol && viaCol.head == 5, s"sql=$viaSql col=$viaCol")
  }
}
