package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the round-3 curation operators: token-window chunking,
  * CDC keep-latest compaction, sparse TF-IDF cosine, int8-quantized
  * ANN — the properties their oracles can't express (reconstruction,
  * recall, boundary shapes).
  */
class ChunkTextSimSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  // ---- chunking ----

  test("chunks cover the token stream with the configured overlap") {
    import spark.implicits._
    val doc = (1 to 150).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val out = Chunking.chunk(df, "doc_id", "text", chunkSize = 64, overlap = 16)
      .orderBy("chunk_idx").collect()
    // 150 tokens, stride 48: starts 0/48/96 — the window at 96 reaches the end
    assert(out.length == 3)
    val texts = out.map(_.getString(2))
    assert(texts(0).startsWith("w1 ") && texts(0).endsWith(" w64"))
    assert(texts(1).startsWith("w49 ") && texts(1).endsWith(" w112"))
    assert(texts(2).startsWith("w97 ") && texts(2).endsWith(" w150"))
    assert(out.map(_.getLong(3)).toSeq == Seq(64L, 64L, 54L))
    // consecutive chunks share exactly `overlap` tokens
    val t0 = texts(0).split(" "); val t1 = texts(1).split(" ")
    assert(t0.takeRight(16).sameElements(t1.take(16)))
  }

  test("chunking edge shapes: short doc, exact fit, empty text") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c"),                                  // shorter than one window
      (2L, (1 to 64).map("t" + _).mkString(" ")),     // exactly one window
      (3L, "")                                        // empty
    ).toDF("doc_id", "text")
    val out = Chunking.chunk(df, "doc_id", "text", 64, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.count(_._1 == 1L) == 1 && out.find(_._1 == 1L).get._4 == 3L)
    assert(out.count(_._1 == 2L) == 1 && out.find(_._1 == 2L).get._4 == 64L)
    val e = out.find(_._1 == 3L).get
    assert(e._3 == "" && e._4 == 0L) // empty doc still yields one (empty) chunk
  }

  test("chunking is row-preserving upstream: every doc id survives") {
    val in = docs.select("doc_id").distinct().count()
    val outIds = Chunking.chunk(docs, "doc_id", "text", 64, 16)
      .select("doc_id").distinct().count()
    assert(in == outIds)
  }

  test("chunkTexts matches chunk()'s texts and preserves null-text rows") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 150).map("w" + _).mkString(" ")),
      (2L, "a b c"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val viaChunk = Chunking.chunk(df.na.fill("", Seq("text")), "doc_id", "text", 64, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val viaTexts = df.select(col("doc_id"),
        posexplode(Chunking.chunkTexts(col("text"), 64, 16)).as(Seq("i", "t")))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong) -> r.getString(2)).toMap
    assert(viaTexts == viaChunk)
    // the null-text doc survives as one empty chunk
    assert(viaTexts((3L, 0L)) == "")
  }

  test("chunker registry node fans one document event into chunk events") {
    import spark.implicits._
    val stage = graft.pipeline.Registry.builtins()
      .instantiateNode("chunker", Map("chunk_size" -> "4", "overlap" -> "1"))
    val events = Seq(("one two three four five six", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), false))
      .toDF("payload", "created", "recovery")
    val out = stage.expand.get(events).select("payload").as[String].collect()
    // 6 tokens, size 4, stride 3 → chunks at 0 and 3
    assert(out.toSeq == Seq("one two three four", "four five six"))
  }

  // ---- keep-latest ----

  test("keepLatest picks the lexicographic (ts, tie) max per key") {
    import spark.implicits._
    val df = Seq(
      ("u1", "click", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      ("u1", "click", java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L),
      ("u1", "click", java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 3L), // ts tie → max id
      ("u2", "view", java.sql.Timestamp.valueOf("2024-01-02 09:00:00"), 9L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val byUser = Dedup.keepLatest(df, Seq("user_id", "event_type"), "ts", "event_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(byUser("u1") == (3L, 3L)) // id 3 wins the tie; 3 versions
    assert(byUser("u2") == (9L, 1L))
  }

  test("keepLatest plan is a single hash aggregation (no window sort)") {
    val plan = Dedup.keepLatest(
      graft.queries.Tables(spark, dir, "events"),
      Seq("user_id", "event_type"), "ts", "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no window operator:\n$plan")
    // struct-max lowers to SortAggregate; what matters is the map-side
    // partial (hot keys combine before the exchange, unlike a window)
    assert(plan.contains("partial_max"), s"expected partial aggregation:\n$plan")
  }

  // ---- TF-IDF cosine ----

  test("tfidf cosine finds near-identical docs and stays under the pair space") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, base),
      (2L, base + " extra"),   // near-identical to 1
      (3L, (100 to 140).map(i => s"z$i").mkString(" ")) // disjoint vocabulary
    ).toDF("doc_id", "text")
    val out = TextSim.tfidfCosinePairs(df, "doc_id", "text", 9, 10, 1000L).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    // num/na/nb are all positive integers
    assert(out.forall(r => r.getLong(2) > 0 && r.getLong(3) > 0 && r.getLong(4) > 0))
  }

  test("tfidf cosine threshold is a true cosine bound") {
    val out = TextSim.tfidfCosinePairs(docs, "doc_id", "text", 9, 10, 1000L).collect()
    out.foreach { r =>
      val (num, na, nb) = (r.getLong(2).toDouble, r.getLong(3).toDouble, r.getLong(4).toDouble)
      assert(num / math.sqrt(na * nb) >= 0.9 - 1e-12)
    }
  }

  // ---- int8 quantization ----

  test("quantizeInt8 codes are in [-127,127] and reconstruct within one step") {
    val codesById = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val vecs = emb.select("vec_id", "embedding").limit(50).collect()
    vecs.foreach { r =>
      val codes = codesById(r.getLong(0))
      val vec = r.getSeq[Float](1)
      assert(codes.forall(c => c >= -127 && c <= 127))
      val mx = vec.map(x => math.abs(x.toDouble)).max
      if (mx > 0) {
        val scale = mx / 127.0
        codes.zip(vec).foreach { case (c, x) =>
          assert(math.abs(c * scale - x) <= scale / 2 + 1e-9,
            s"code $c reconstructs ${c * scale}, expected ~$x")
        }
      }
    }
  }

  test("quantizeInt8 zero vectors quantize to zero codes and never rank above real matches") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0f, 0f, 0f)),
      (2L, Array(1f, 2f, 3f)),
      (3L, Array(2f, 4f, 6f)),   // parallel to 2 → top match
      (4L, Array(-1f, -2f, -3f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    assert(q(1L)._1.forall(_ == 0L) && q(1L)._2 == 0L)
    val top = Similarity.int8TopK(df.filter(col("vec_id") === 2), df, "vec_id", "embedding", 3)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    // parallel first; anti-parallel (cos −1) still beats the zero
    // vector, which the −2 guard pins strictly below any real cosine
    assert(top == Seq(3L, 4L, 1L), s"got $top")
  }

  test("int8 ANN recall@10 vs full precision is high") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val quant = Similarity.int8TopK(queries, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = exact.map { case (q, ids) => (quant(q) & ids).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean int8 recall@10 = $mean")
  }

  // ---- content-defined chunking ----

  test("cdcChunks: boundaries are content-anchored — an edit reshapes only local chunks") {
    import spark.implicits._
    val words = (1 to 400).map(i => s"w${i * 7919 % 1000}")
    val original = words.mkString(" ")
    // replace ONE word a third of the way in
    val edited = words.updated(133, "EDITED").mkString(" ")
    val df = Seq((1L, original), (2L, edited)).toDF("doc_id", "text")
    val chunks = Chunking.cdcChunks(df, "doc_id", "text", avgWords = 16)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    val a = chunks.filter(_._1 == 1L).map(_._2)
    val b = chunks.filter(_._1 == 2L).map(_._2)
    assert(a.nonEmpty && b.nonEmpty)
    // the tail far from the edit is chunked IDENTICALLY (fixed windows
    // would shift every chunk after the edit point)
    val shared = a.toSet.intersect(b.toSet)
    assert(a.takeRight(3) == b.takeRight(3), "tail chunks must be untouched by an early edit")
    assert(shared.size >= a.size - 3,
      s"edit should reshape at most a couple of chunks: ${a.size} vs shared ${shared.size}")
    assert(a.toSet != b.toSet, "the edited chunk itself must differ")
    // lossless: chunks concatenate back to the normalized document
    assert(a.mkString(" ") == original)
    assert(b.mkString(" ") == words.updated(133, "EDITED").mkString(" "))
  }

  test("cdcChunks: empty and whitespace-only docs yield no chunks; sizes track avgWords") {
    import spark.implicits._
    val dense = (1 to 2000).map(i => s"t${i * 104729 % 9973}").mkString(" ")
    val df = Seq((1L, dense), (2L, ""), (3L, "   "), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Chunking.cdcChunks(df, "doc_id", "text", avgWords = 16).collect()
    assert(out.forall(_.getLong(0) == 1L), "only the dense doc chunks")
    val sizes = out.map(_.getLong(3))
    assert(sizes.sum == 2000)
    val mean = sizes.sum.toDouble / sizes.length
    assert(mean > 8 && mean < 32, s"geometric mean size should track avgWords=16, got $mean")
  }

  test("cdcDuplicateChunks finds a boilerplate block shared across different documents") {
    import spark.implicits._
    val boiler = (1 to 60).map(i => s"boiler$i").mkString(" ")
    val docs = (1L to 5L).map(i =>
      (i, s"unique lead ${i} " + boiler + s" unique tail ${i * 31}")) :+
      (99L, "completely unrelated text with none of the shared block")
    val dups = Dedup.cdcDuplicateChunks(docs.toDF("doc_id", "text"), "doc_id", "text",
        avgWords = 16, minWords = 5)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(dups.nonEmpty, "shared boilerplate must surface as duplicated chunks")
    // the interior boilerplate chunks appear in all 5 docs with min_doc = 1
    assert(dups.exists { case (nDocs, minDoc) => nDocs == 5L && minDoc == 1L }, dups.toList.toString)
  }
}
