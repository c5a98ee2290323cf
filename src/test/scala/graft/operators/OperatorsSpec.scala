package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Operator-level semantics the oracle queries can't express: ANN
  * recall vs the exact baseline, blocking losslessness, multimodal
  * batch shapes.
  */
class OperatorsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("exact dedup keeps one representative per key and counts dups") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "k")
    val out = Dedup.exact(df, Seq("k"), "id").collect()
    val m = out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("a") == (1L, 2L) && m("b") == (3L, 1L))
  }

  test("jaccard pairs are symmetric-free and threshold-consistent") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text").collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    // integer threshold: inter*den >= un*num
    assert(pairs.forall(r => r.getLong(2) * 10 >= r.getLong(3)))
  }

  test("connected components label every vertex with the min reachable id") {
    import spark.implicits._
    // chain 1-2-3-4-5-6 (needs multiple propagation rounds), a separate
    // pair {10,11}, and a triangle {20,21,22}
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (6L, 5L),
      (11L, 10L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("da", "db")
    val comp = Dedup.connectedComponents(pairs, "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).forall(comp(_) == 1L), s"chain mislabeled: $comp")
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(Seq(20L, 21L, 22L).forall(comp(_) == 20L))
    assert(comp.size == 11)
  }

  test("star-contraction components match propagation on chains and triangles") {
    import spark.implicits._
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (6L, 5L),
      (11L, 10L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("da", "db")
    val prop = Dedup.connectedComponents(pairs, "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Dedup.connectedComponentsStar(pairs, "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop, s"star=$star prop=$prop")
    // a 12-node chain: diameter 11, well past a couple of rounds
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("da", "db")
    val chainStar = Dedup.connectedComponentsStar(chain, "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 12L).forall(chainStar(_) == 1L), s"chain mislabeled: $chainStar")
    // a fixed pseudo-random 30-edge graph over 25 nodes
    val rng = new scala.util.Random(7)
    val rand = Seq.fill(30)((rng.nextInt(25).toLong, rng.nextInt(25).toLong))
      .filter { case (a, b) => a != b }.toDF("da", "db")
    val p2 = Dedup.connectedComponents(rand, "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = Dedup.connectedComponentsStar(rand, "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s2 == p2, s"random graph diverged: star=$s2 prop=$p2")
  }

  test("LSH bucket cap drops boilerplate buckets, keeps the genuine pairs") {
    import spark.implicits._
    // 50 identical vectors (one boilerplate bucket in every table) plus
    // two genuinely-near distinct vectors
    val boiler = (1L to 50L).map(i => (i, Array(1f, 0f, 0f, 0f)))
    val near = Seq(100L -> Array(0f, 1f, 0.05f, 0f), 101L -> Array(0f, 1f, 0f, 0.05f))
    val df = (boiler ++ near).toDF("id", "vec")
    val capped = Similarity.lshCandidates(df, "id", "vec", maxBucket = 10L)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 50-way duplicate bucket (1225 pairs) is gone; the near pair
    // survives if it buckets apart from the boilerplate
    assert(!capped.exists { case (a, b) => a <= 50 && b <= 50 },
      s"boilerplate bucket not capped: $capped")
    assert(capped.contains((100L, 101L)), s"genuine near pair lost: $capped")
    // no cap (default) keeps the historical behavior
    val uncapped = Similarity.lshCandidates(df, "id", "vec")
      .select("ida", "idb").collect().length
    assert(uncapped >= 1225, s"uncapped run should keep duplicate pairs: $uncapped")
  }

  test("63-bit simhash blocked join equals brute-force hamming filter") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (1L to 40L).map { i =>
      (i, if (i % 5 == 0) base else s"$base doc$i word${i % 11} extra${i % 7}")
    }.toDF("doc_id", "text")
    val blocked = Dedup.simhashPairs63(docs, "doc_id", "text", n = 3, maxHamming = 3)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs.select(col("doc_id"),
      graft.functions.Hashing.simhash63(
        graft.functions.TextFunctions.shingles(col("text"), 3)).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sh.keys; b <- sh.keys if a < b
      if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 3
    } yield (a, b)).toSet
    assert(blocked == brute, s"blocked=$blocked brute=$brute")
    assert(brute.nonEmpty, "test corpus produced no near-dups")
  }

  test("property: band star-pairing preserves components at ANY cap, over seeded corpora") {
    import spark.implicits._
    // duplicate-heavy random-ish corpora (seed-varied): the invariance
    // claim must hold at the most aggressive cap (1 — every multi-member
    // bucket star-pairs), not just the shipped default
    for (seed <- Seq(1, 7, 13)) {
      val docs = (1L to 60L).map { i =>
        val grp = (i * seed) % 9
        val text =
          if (grp < 3) s"dup cluster text $grp $grp common body shared words here"
          else s"unique doc $i seed $seed body ${i * seed % 17} tail ${i % 5} filler words"
        (i, text)
      }.toDF("doc_id", "text")
      def comps(cap: Long) = Dedup.connectedComponents(
          Dedup.minhashLshCandidates(docs, "doc_id", "text", maxBandOccupancy = cap),
          "da", "db")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val uncapped = comps(Long.MaxValue)
      assert(uncapped.nonEmpty, s"seed $seed produced no pairs")
      assert(comps(1L) == uncapped, s"seed $seed: cap=1 changed components")
    }
  }

  test("collapsed simhash: linear pairs on duplicate clusters, identical components") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // a 10-doc identical cluster (one fingerprint) + varied docs
    val docs = (1L to 40L).map { i =>
      (i, if (i % 4 == 0) base else s"$base doc$i word${i % 11} extra${i % 7}")
    }.toDF("doc_id", "text")
    val plain = Dedup.simhashPairs63(docs, "doc_id", "text", n = 3, maxHamming = 3)
    val collapsed = Dedup.simhashPairs63Collapsed(docs, "doc_id", "text", n = 3, maxHamming = 3)
    // every collapsed pair is a genuinely qualifying pair (subset of plain)
    val pPairs = plain.select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cPairs = collapsed.select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cPairs.subsetOf(pPairs), s"collapsed emitted non-qualifying pairs: ${cPairs -- pPairs}")
    // the identical cluster (10 docs) contributes 45 pairs plain, 9 star
    // edges collapsed — linear vs quadratic
    assert(cPairs.size < pPairs.size, s"collapse had no effect: ${cPairs.size}")
    // connected components are IDENTICAL — the dedup contract
    def comps(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.connectedComponents(pairs, "da", "db")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(plain) == comps(collapsed), "collapse changed dedup groups")
  }

  test("repeated spans: cross-doc windows flag with positions; within-doc repetition alone does not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e x y z w v"),          // shares 'a b c d e' with doc 2
      (2L, "q r a b c d e s t u"),          // ... at position 2
      (3L, "m m m m m m m m m m"),          // within-doc repetition only
      (4L, "p q r s t")                      // unique 5-gram, no flag
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", n = 5, minDocs = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((1L, 0L, 2L), (2L, 2L, 2L)), spans.toString)
  }

  test("IVF empty clusters reseed to the furthest training points") {
    import spark.implicits._
    // ids 1-4 share one direction, so all four init centroids are
    // identical, every point assigns to cluster 0 (argmax ties → lowest
    // index), and clusters 1-3 are empty from round one — the stale-
    // centroid trap. Reseed must hand them the furthest points (dot 0,
    // ties → lowest id): ids 5, 6, 7.
    val df = (
      (1L to 4L).map(i => (i, Array(1f, 0f, 0f, 0f))) ++ Seq(
        5L -> Array(0f, 1f, 0f, 0f),
        6L -> Array(0f, 0f, 1f, 0f),
        7L -> Array(0f, 0f, 0f, 1f))).toDF("id", "vec")
    val cents = Similarity.ivfCentroids(df, "id", "vec", nList = 4, iters = 2)
    assert(cents.map(_.toSeq).distinct.length == 4,
      s"expected 4 distinct centroids after reseed: ${cents.map(_.toSeq).toSeq}")
    // the reseeded lists point at the orthogonal directions, in id order
    assert(cents(1).indexOf(cents(1).max) == 1 &&
      cents(2).indexOf(cents(2).max) == 2 &&
      cents(3).indexOf(cents(3).max) == 3,
      s"reseeded centroids misdirected: ${cents.map(_.toSeq).toSeq}")
    val again = Similarity.ivfCentroids(df, "id", "vec", nList = 4, iters = 2)
    assert(cents.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "reseed not deterministic")
  }

  test("long-chain graph fires the star auto-switch after the round budget") {
    import spark.implicits._
    // a 64-node chain: diameter 63, so pure propagation would need ~63
    // full-shuffle rounds; the switch caps it at switchAfter + O(log n)
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("da", "db")
    val (out, stats) = Dedup.connectedComponentsWithStats(
      chain, "da", "db", maxIters = 30, switchAfter = 3)
    assert(stats.switchedToStar, s"expected the auto-switch to fire: $stats")
    assert(stats.propRounds == 3, s"propagation should stop at the budget: $stats")
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 64 && labels.values.forall(_ == 0L),
      s"chain mislabeled after switch: $labels")
    // a shallow graph converges inside the budget and never switches
    val shallow = Seq((1L, 2L), (1L, 3L), (10L, 11L)).toDF("da", "db")
    val (out2, stats2) = Dedup.connectedComponentsWithStats(
      shallow, "da", "db", maxIters = 30, switchAfter = 5)
    assert(!stats2.switchedToStar && stats2.propRounds <= 3, s"unexpected: $stats2")
    val l2 = out2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L), l2.toString)
  }

  test("property: components match a union-find reference on random graphs") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import spark.implicits._
    // small graphs: each check drives a full multi-round Spark loop, so
    // the budget goes to graph VARIETY (5 checks), not graph size
    val pairsGen = Gen.listOfN(10, for {
      a <- Gen.choose(0L, 12L); b <- Gen.choose(0L, 12L) if a != b
    } yield (math.max(a, b), math.min(a, b)))
    val prop = Prop.forAll(pairsGen) { pairs =>
      pairs.isEmpty || {
        // union-find ground truth
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val truth = parent.keySet.toList.map(v => v -> find(v)).toMap
        val got = Dedup.connectedComponents(pairs.toDF("da", "db"), "da", "db")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == truth
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("minhash LSH candidates recall the high-jaccard pairs") {
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", num = 1, den = 2)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minhashLshCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain near-dup docs")
    val recall = truth.intersect(cand).size.toDouble / truth.size
    assert(recall >= 0.9, s"LSH recall $recall over ${truth.size} true pairs")
  }

  test("simhash blocked join equals brute-force hamming filter") {
    import graft.functions.{Hashing, TextFunctions}
    val sh = docs.select(col("doc_id"),
      Hashing.simhash32(TextFunctions.shingles(col("text"), 3)).as("sh"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute)
  }

  test("ANN LSH top-k has useful recall of exact top-k") {
    val exact = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.lshTopK(emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // 16 planes / 4 tables on random 64-dim data: recall is modest by
    // design (buckets prune ~94% of pairs); assert it beats chance x20
    assert(recall > 0.1, s"ANN recall $recall")
  }

  test("dedup keep-best keeps the highest-quality member, not the lowest id") {
    val s = spark
    import s.implicits._
    import graft.functions.TextFunctions
    // docs 1 and 2 are near-identical; doc 2 is longer (higher
    // qualityScorePpm) so the keep-best rule must pick id 2 where the
    // canonical rule keeps id 1
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3).trim
    val docs = Seq(
      (1L, base),
      (2L, base + " " + base), // same shingle set + repeat-boundary grams: longer ⇒ higher ppm
      (3L, "completely different content words nothing in common here at all today")
    ).toDF("doc_id", "text")
    val best = Dedup.dedupByMinhashKeepBest(docs, "doc_id", "text",
        TextFunctions.qualityScorePpm(col("text")))
      .select("doc_id").as[Long].collect().toSet
    val canonical = Dedup.dedupByMinhash(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(canonical == Set(1L, 3L), canonical.toString)
    assert(best == Set(2L, 3L), best.toString)
  }

  test("common spans: maximal cross-doc runs with exact offsets") {
    val s = spark
    import s.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"$shared x y z w v u t s r q p"),
      (3L, "unrelated words only here nothing shared at all today friend")
    ).toDF("doc_id", "text")
    val spans = Dedup.commonSpans(docs, "doc_id", "text", n = 5, minSpan = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 1 carries the 10-word shared run at word 2; doc 2 at word 0
    assert(spans.toSeq == Seq((1L, 2L, 2L, 0L, 10L)), spans.mkString(","))
    // below minSpan: a 7-word overlap is suppressed at minSpan=8, found at 7
    val short = Seq(
      (1L, "a b c d e f g tail1 tail2 tail3"),
      (2L, "a b c d e f g other1 other2 other3")).toDF("doc_id", "text")
    assert(Dedup.commonSpans(short, "doc_id", "text", n = 5, minSpan = 8).count() == 0)
    val found = Dedup.commonSpans(short, "doc_id", "text", n = 5, minSpan = 7)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(found == Seq((0L, 0L, 7L)), found.mkString(","))
  }

  test("trim spans: later doc loses the run, earlier keeps it, untouched verbatim") {
    val s = spark
    import s.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"$shared x y z w v u t s r"),
      (3L, shared), // doc 3 is ENTIRELY the shared run → trimmed to empty
      (4L, "untouched doc with completely different words here today friend")
    ).toDF("doc_id", "text")
    val out = Dedup.removeCommonSpans(docs, "doc_id", "text", n = 5, minSpan = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == s"one two $shared three four") // lowest id keeps the run
    assert(out(2L) == "x y z w v u t s r", out(2L))
    assert(out(3L) == "", out(3L))
    assert(out(4L) == "untouched doc with completely different words here today friend")
  }

  test("PQ codes are compact and reconstruct to the right shape") {
    val cb = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 4, ksub = 8)
    assert(cb.length == 4 && cb.forall(_.length == 8) && cb.forall(_.forall(_.length == 16)))
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding", cb)
    val codes = enc.collect()
    assert(codes.forall(_.getSeq[Int](1).length == 4))
    assert(codes.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 8)))
    import org.apache.spark.sql.functions.{col, size => asize}
    val dims = enc.select(asize(Similarity.pqReconstruct(col("pq_code"), cb)))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(dims == Seq(64), s"reconstruction dims: $dims")
  }

  test("PQ top-k has useful recall of exact top-k") {
    val probes = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(probes, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.pqTopK(probes, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // 4 subspaces x 8 codewords compresses 64 floats to 4 codes (64x);
    // exact cosine ranks by angle while ADC ranks by inner product of
    // reconstructions — still far above chance (10/500 = 2%)
    assert(recall > 0.1, s"PQ recall $recall")
  }

  test("binary sign signatures pack exactly the positive dims, 32 per block") {
    import spark.implicits._
    val v = Array.tabulate(70)(i => if (i % 3 == 0) 0.5f else if (i % 3 == 1) -0.5f else 0f)
    val sig = Similarity.binarizeSign(Seq((1L, v)).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .collect().head.getSeq[Long](1)
    assert(sig.length == 3) // ceil(70/32)
    val expected = (0 until 70).filter(i => v(i) > 0f)
    val got = for {
      b <- sig.indices; j <- 0 until 32
      if (sig(b) & (1L << j)) != 0L
    } yield b * 32 + j
    assert(got.toSet == expected.toSet)
    assert(sig.forall(_ >= 0L), "32-bit blocks must never set the sign bit")
  }

  test("binary rerank: useful recall at shortlist 50; full shortlist equals brute force") {
    val probes = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(probes, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.binaryRerankTopK(probes, emb, "vec_id", "embedding",
        k = 10, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // 1 bit/dim keeps only the orthant; with exact rerank on a 50-deep
    // shortlist recall is strong on 64-dim data
    assert(recall > 0.5, s"binary+rerank recall $recall")
    // shortlist >= corpus: hamming ordering becomes irrelevant, the
    // exact rerank must reproduce brute force bit-for-bit
    val full = Similarity.binaryRerankTopK(probes, emb, "vec_id", "embedding",
        k = 10, shortlist = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(full == exact)
  }

  test("PQ rerank: exact re-rank beats raw PQ recall; full shortlist equals brute force") {
    val probes = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(probes, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // shortlist >= corpus: every candidate re-ranked exactly -> must
    // EQUAL brute force rank-for-rank (the rerank stage is exact)
    val full = Similarity.pqRerankTopK(probes, emb, "vec_id", "embedding",
        k = 10, shortlist = 600)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == exact, "full-shortlist rerank must equal brute force")
    // at shortlist=50 the rerank's recall dominates raw PQ's (the
    // exact stage can only fix ranks within the shortlist, never hurt)
    val exactIds = exact.map(t => (t._1, t._3))
    def recallOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        .intersect(exactIds).size.toDouble / exactIds.size
    val rawPq = recallOf(Similarity.pqTopK(probes, emb, "vec_id", "embedding", 10))
    val rerank = recallOf(Similarity.pqRerankTopK(probes, emb, "vec_id", "embedding",
      k = 10, shortlist = 50))
    assert(rerank >= rawPq, s"rerank recall $rerank < raw PQ recall $rawPq")
  }

  test("IVF append stats: frozen-quantizer ledger partitions both sides over the lists") {
    import org.apache.spark.sql.functions._
    val corpus = emb.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    val incoming = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
    val stats = Similarity.ivfAppendStats(corpus, incoming, "vec_id", "embedding", nList = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(stats.map(_._2).sum == corpus.count(), "every corpus row in exactly one list")
    assert(stats.map(_._3).sum == incoming.count(), "every incoming row in exactly one list")
    assert(stats.forall(s => s._1 >= 0 && s._1 < 16))
    // deterministic: the frozen model assigns identically on re-run
    val again = Similarity.ivfAppendStats(corpus, incoming, "vec_id", "embedding", nList = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(stats.toSet == again.toSet)
  }

  test("centroid outliers: zero vectors always flagged, centroid-aligned vectors never") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // 40 vectors on one direction (their centroid), 1 zero vector,
    // 1 near-orthogonal stray
    val rows = (1L to 40L).map(i => (i, Seq(1f, 0f, 0f, 0f))) ++
      Seq((98L, Seq(0f, 0f, 0f, 0f)), (99L, Seq(0.01f, 1f, 0f, 0f)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.centroidOutliers(df, "vec_id", "embedding", nList = 2, minCos = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out.contains(98L) && out(98L) == -2.0, s"zero vector not flagged: $out")
    assert(!(1L to 40L).exists(out.contains), s"aligned vectors flagged: $out")
  }

  test("IVFADC top-k has useful recall and beats or matches plain PQ's candidate scope") {
    val probes = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(probes, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfpq = Similarity.ivfPqTopK(probes, emb, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // residual codes + 4-of-16-list pruning on random 64-dim data:
    // assert well above chance (5/500 = 1%)
    val recall = exact.intersect(ivfpq).size.toDouble / exact.size
    assert(recall > 0.1, s"IVFADC recall $recall")
    // every probe still gets its full k (pruning never starves a query)
    val perProbe = ivfpq.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perProbe.values.forall(_ == 5), s"short result lists: $perProbe")
  }

  test("profile: per-column stats from one pass, nulls/distincts/min-max correct") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Option("a")), (2L, None), (3L, Option("b")), (4L, Option("a")))
      .toDF("id", "v")
    val p = Profile.profile(df, exactDistinct = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("v") == ((4L, 1L, 2L, "a", "b")))
    // sketch mode tracks exact within the configured rsd at this size
    val approx = Profile.profile(df)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(approx("id") == 4L && approx("v") == 2L)
  }

  test("profile survives column names containing dots (ingested-JSON shape)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("user.id", "user.name")
    val p = Profile.profile(df, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p == Map("user.id" -> 2L, "user.name" -> 2L), p.toString)
  }

  test("top-terms: broadcast-vocab and AQE-shuffle paths produce identical results") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // four decision paths: forced broadcast (MaxValue, no measurement
    // job), forced shuffle (0), adaptive-fits (finite threshold above
    // the vocab), adaptive-exceeds (threshold 1). Results must not
    // depend on the path.
    val hinted = TopTerms.topTermsPerDoc(docs, "doc_id", "text",
      broadcastVocabMax = Long.MaxValue)
    val shuffled = TopTerms.topTermsPerDoc(docs, "doc_id", "text",
      broadcastVocabMax = 0L)
    val adaptiveFits = TopTerms.topTermsPerDoc(docs, "doc_id", "text",
      broadcastVocabMax = 10000000L)
    val adaptiveExceeds = TopTerms.topTermsPerDoc(docs, "doc_id", "text",
      broadcastVocabMax = 1L)
    def hasHint(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString.contains("strategy=broadcast")
    assert(hasHint(hinted), "forced-broadcast path lost the hint")
    assert(!hasHint(shuffled), "forced-shuffle path kept the hint")
    assert(hasHint(adaptiveFits), "adaptive path dropped the hint for a fitting vocab")
    assert(!hasHint(adaptiveExceeds), "adaptive path kept the hint past the threshold")
    assert(rows(hinted) == rows(shuffled))
    assert(rows(hinted) == rows(adaptiveFits))
    assert(rows(hinted) == rows(adaptiveExceeds))
    // min-df pruning removes hapax terms from the vocabulary entirely
    val pruned = TopTerms.topTermsPerDoc(docs, "doc_id", "text", minDf = 2L)
    assert(pruned.filter(col("df") < 2).count() == 0)
  }

  test("blocked embedding-cosine pairs are a subset of all-pairs with useful recall") {
    // all-pairs is the spec-only exact reference; the shipped query
    // (dd_embedding_cosine) runs the blocked path
    val exact = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.embeddingCosinePairsBlocked(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(exact), "blocked pairs must pass the same exact-cosine filter")
    val recall = if (exact.isEmpty) 1.0 else blocked.size.toDouble / exact.size
    assert(recall > 0.3, s"blocked recall $recall over ${exact.size} true pairs")
  }

  test("ANN IVF top-k recall beats LSH at the same candidate budget; deterministic") {
    val exact = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 10, nList = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    // probing 4/16 lists scans ~25% of the corpus per query; learned
    // (Lloyd) partitions concentrate neighbors far above that floor
    assert(recall > 0.3, s"IVF recall $recall")
    val again = Similarity.ivfTopK(emb, "vec_id", "embedding", 10, nList = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again == ivf, "IVF index not deterministic")
  }

  test("connected components and keep-best dedup work on STRING ids") {
    val s = spark
    import s.implicits._
    // a 4-hop chain needs >1 propagation round: the old decimal-sum
    // convergence check nulled on strings and read null==null as
    // instant convergence (partial labels); the old star path cast ids
    // to long (all-null edges). Both now exact and type-preserving.
    val chain = Seq(("urlB", "urlC"), ("urlC", "urlD"), ("urlD", "urlE"),
      ("urlA", "urlB")).toDF("da", "db")
    val prop = Dedup.connectedComponents(chain, "da", "db")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(prop == Map("urlA" -> "urlA", "urlB" -> "urlA", "urlC" -> "urlA",
      "urlD" -> "urlA", "urlE" -> "urlA"), s"propagation: $prop")
    val star = Dedup.connectedComponentsStar(chain, "da", "db")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(star == prop, s"star: $star")
    // keep-best with string ids: highest ord survives, ties -> min id
    val dup = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(("urlX", dup, 1L), ("urlY", dup, 9L), ("urlZ", dup, 9L),
      ("urlSolo", "completely different words with no overlap at all", 5L))
      .toDF("doc_id", "text", "quality")
    val kept = Dedup.dedupByMinhashKeepBest(docs, "doc_id", "text", col("quality"))
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("urlY", "urlSolo"), s"kept: $kept")
  }

  test("recallAtK: exact self-recall, missed probes kept at 0, integer ppm") {
    val s = spark
    import s.implicits._
    val exact = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 20L), (2L, 2, 21L), (2L, 3, 22L)).toDF("qid", "rank", "nid")
    // approx: qid 1 recovers 2 of 3; qid 2 recovers nothing (missed
    // entirely — e.g. its probe landed in empty lists)
    val approx = Seq((1L, 1, 10L), (1L, 2, 12L), (1L, 3, 99L)).toDF("qid", "rank", "nid")
    val out = Similarity.recallAtK(approx, exact)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 2L, 2L * 1000000L / 3L)))
    assert(out(2L) == ((3L, 0L, 0L))) // present with zero recall, not dropped
    // perfect self-recall is exactly 1e6
    val self = Similarity.recallAtK(exact, exact).collect()
    assert(self.forall(_.getLong(3) == 1000000L))
  }

  test("multimodal: frame sampling shape and stub decode schema") {
    val d = docs.select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("content"))
      .select(col("doc_id"),
        Multimodal.decodeMeta(col("content"), Multimodal.kindOf(col("source"))).as("meta"))
    val frames = Multimodal.sampleFrames(d, "meta", 5000L)
    // images (duration 0) contribute exactly one frame; media with
    // duration d contribute ceil(d/5000)
    val perDoc = frames.groupBy("doc_id").count()
      .join(d.select(col("doc_id"), col("meta.duration_ms").as("dur")), "doc_id")
      .collect()
    assert(perDoc.forall { r =>
      val (n, dur) = (r.getLong(1), r.getLong(2))
      if (dur == 0) n == 1 else n == (dur + 4999) / 5000
    })
    val feat = d.select(Multimodal.fakeFeatures(col("meta.kind"), 8).as("f"))
      .select(size(col("f"))).distinct().collect()
    assert(feat.map(_.getInt(0)).toList == List(8))
  }

  test("incremental dedup flags incoming docs already in the corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "totally different corpus content down here")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (11L, "nothing like anything stored before at all ok")).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshCandidatesAgainst(incoming, corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((10L, 1L)), s"exact dup not flagged: ${pairs.toList}")
    assert(!pairs.exists(_._1 == 11L), s"novel doc flagged: ${pairs.toList}")
    val kept = Dedup.dedupIncomingByMinhash(incoming, corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L), s"apply should keep only the novel doc: $kept")
    // cap=1 stars every corpus bucket to its min — the dup is still
    // caught (the drop signal survives the cap)
    val starred = Dedup.minhashLshCandidatesAgainst(incoming, corpus, "doc_id", "text",
        maxBandOccupancy = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(starred.contains((10L, 1L)), s"star path lost the dup signal: ${starred.toList}")
  }

  test("containment pairs catch subset dups that jaccard misses") {
    import spark.implicits._
    val para = "the quick brown fox jumps over the lazy dog again and again"
    // doc 2 embeds doc 1 verbatim inside ~9× more text: containment of
    // the small side is ~1, jaccard is far below the 1/2 line
    val page = ("aaaa bbbb cccc dddd " * 12) + para + (" eeee ffff gggg hhhh" * 12)
    val df = Seq((1L, para), (2L, page), (3L, "entirely unrelated text body")).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(df, "doc_id", "text", n = 3, num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cont.toSet == Set((1L, 2L)), s"expected the embedded pair only: ${cont.toList}")
    val jac = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 3, num = 5, den = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!jac.contains((1L, 2L)), "jaccard at the same 1/2 line should miss the subset dup")
    // the contained side is identifiable as the smaller shingle set
    val row = Dedup.ngramContainmentPairs(df, "doc_id", "text", n = 3, num = 1, den = 2)
      .collect().head
    assert(row.getLong(3) < row.getLong(4), "na (doc 1, the contained side) must be smaller")
  }

  test("semantic dedup: one keeper per group, min-id group labels, total coverage") {
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", eps = 0.4, nList = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == emb.count(), "every input id labeled exactly once")
    val byGrp = out.groupBy(_._2)
    assert(byGrp.values.forall(_.count(_._3) == 1),
      s"a group without exactly one keeper: ${byGrp.find(_._2.count(_._3) != 1)}")
    // component labels follow the min-reachable-id convention
    assert(byGrp.forall { case (g, rows) => rows.map(_._1).min == g })
    // singletons keep themselves
    assert(byGrp.valuesIterator.filter(_.length == 1).forall(_.head._3))
  }

  test("semantic dedup groups same-direction vectors; ties keep the lowest id") {
    import spark.implicits._
    // 8 directions (one-hot), 5 copies each at different magnitudes:
    // cosine is 1 within a direction, 0 across — so each direction is
    // one duplicate group regardless of what centroids Lloyd learns,
    // and the keep rule's centroid-cosine ties resolve to the lowest id
    val vecs = for (d <- 0 until 8; c <- 0 until 5) yield {
      val v = Array.fill(8)(0f); v(d) = (c + 1).toFloat
      (d * 100L + c, v.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, "vec_id", "embedding", eps = 0.4, nList = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == 40)
    val byGrp = out.groupBy(_._2)
    assert(byGrp.size == 8, s"expected 8 direction groups: ${byGrp.keySet}")
    assert(byGrp.forall { case (g, rows) =>
      rows.length == 5 && rows.filter(_._3).map(_._1).toList == List(g)
    }, "each direction keeps exactly its lowest id")
  }

  test("semantic dedup fused keep rule == independent argmin(cc, id) per component") {
    // r17 fused the representative selection (was: two corpus joins +
    // a corpus-wide aggregation; now: one window over the dup-graph
    // subset). The keep rule's CONTRACT is unchanged: within each
    // multi-member group, keep exactly the member with the smallest
    // (centroid-cosine, id) — re-derive cc independently through the
    // same public quantizer APIs and check the keeper is that argmin.
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", eps = 0.4, nList = 16)
      .select("id", "grp", "keep")
    val unit = Similarity.unitNorm(
      Similarity.ivfCentroids(emb, "vec_id", "embedding", nList = 16, iters = 2))
    val cc = emb.select(col("vec_id").as("id"),
        graft.functions.Kernels.ivfAssign(col("embedding"), unit).as("list"),
        graft.functions.Kernels.ivfScores(col("embedding"), unit).as("scores"),
        graft.functions.Kernels.vecNorm2(col("embedding")).as("nrm"))
      .select(col("id"),
        when(col("nrm") === 0d, lit(-1d)).otherwise(
          element_at(col("scores"), col("list") + 1) / sqrt(col("nrm"))).as("cc"))
    val rows = out.join(cc, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
    rows.groupBy(_._2).foreach { case (g, members) =>
      val keepers = members.filter(_._3).map(_._1)
      assert(keepers.length == 1, s"group $g keeps ${keepers.length}")
      if (members.length > 1) {
        val argmin = members.minBy(m => (m._4, m._1))._1
        assert(keepers.head == argmin,
          s"group $g keeps ${keepers.head}, argmin(cc,id) is $argmin")
      } else assert(keepers.head == members.head._1)
    }
  }

  test("semantic dedup occupancy cap is conservative: capped-out lists dedup nothing") {
    // cap 0 excludes every list from pairing — all rows survive as
    // their own singleton group (skipped, not guessed)
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding",
        eps = 0.4, nList = 16, maxListOccupancy = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.forall(r => r._3 && r._1 == r._2))
  }

  test("normalizeForDedup collapses case/punct/whitespace variants; exact dedup catches them") {
    val s = spark
    import s.implicits._
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),
      (3L, "HELLO... world"),
      (4L, "hello worlds"), // NOT a variant
      (5L, "  hello\tworld ")
    ).toDF("doc_id", "text")
    val norm = docs.select(col("doc_id"),
        TextFunctions.normalizeForDedup(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(norm(1L) == "hello world" && norm(2L) == "hello world" &&
      norm(3L) == "hello world" && norm(5L) == "hello world")
    assert(norm(4L) == "hello worlds")
    val grouped = Dedup.exact(
        docs.withColumn("fp", TextFunctions.fingerprint(
          TextFunctions.normalizeForDedup(col("text")))),
        Seq("fp"), "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // raw-text exact dedup would find 5 singletons; normalized finds
    // the 4-member variant group
    assert(grouped.toSeq == Seq((1L, 4L), (4L, 1L)))
  }
}
