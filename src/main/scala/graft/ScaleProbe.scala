package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical scale-curvature probe: run the heavy dedup/ANN operators
  * on 1×/2×/8× blow-ups of the same corpus and print warm runtimes, so
  * the SCALING.md claims ("bucketed, never quadratic") are backed by a
  * measured growth curve, not only plan shape.
  *
  * `runMain graft.ScaleProbe <dir1x> <dir2x> <dir8x>` where each dir
  * holds `documents*.parquet` (and optionally `embeddings*.parquet`).
  * Not part of the driver contract; a measurement tool.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def bench(label: String, path: String): Unit = {
      val docs = spark.read.parquet(path)
      val nDocs = docs.count()
      // warm + 2 reps, report min (tightest bound on the true cost)
      def best(f: => Long): Double = { time(f); math.min(time(f), time(f)) }
      val jac = best(graft.operators.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", n = 3, num = 1, den = 10, maxShingleFreq = 1000L).count())
      val lsh = best(graft.operators.Dedup.minhashLshCandidates(
        docs, "doc_id", "text", n = 3, k = 8, bands = 2).count())
      val sim = best(graft.operators.Dedup.simhashPairs(
        docs, "doc_id", "text", n = 3, maxHamming = 3).count())
      val sim63 = best(graft.operators.Dedup.simhashPairs63(
        docs, "doc_id", "text", n = 3, maxHamming = 3).count())
      val comp = best {
        val pairs = graft.operators.Dedup.minhashLshCandidates(
          docs, "doc_id", "text", n = 3, k = 8, bands = 2)
        graft.operators.Dedup.connectedComponents(pairs, "da", "db").count()
      }
      val tfidf = best(graft.operators.TextSim.tfidfCosinePairs(
        docs, "doc_id", "text", tNum = 9, tDen = 10, maxTermDocs = 1000L).count())
      val spans = best(graft.operators.Dedup.repeatedSpans(
        docs, "doc_id", "text", n = 5, minDocs = 2L).count())
      val pack = best {
        val chunks = graft.operators.Chunking.chunk(docs, "doc_id", "text", 64, 16)
        graft.operators.Packing.packOffsets(spark, chunks,
          "doc_id", "chunk_idx", "n_tokens", budget = 2048L, buckets = 32).count()
      }
      // round-8 additions: CDC chunking (pure map — must stay linear),
      // BM25 retrieval (posting-bound; probe count held constant),
      // KMV sketch + sample quantiles (k-bounded aggregations)
      val cdc = best(graft.operators.Chunking.cdcChunks(
        docs, "doc_id", "text", avgWords = 16).count())
      val bm25 = best(graft.operators.TextSim.bm25TopK(
        docs, "doc_id", "text",
        docs.filter(pmod(col("doc_id"), lit(1000L)) === 0 && col("doc_id") < 100000000L),
        "doc_id", "text", k = 10, maxTermDocs = 1000L).count())
      val kmv = best(graft.operators.Profile.distinctKmv(
        docs, Seq("source"), "text", k = 64).count())
      val sq = best(graft.operators.Profile.sampleQuantiles(
        docs, Seq("source"), "doc_id", "n_chars", k = 256).count())
      // round-9 additions: bigram-LM scoring (count shuffles + join
      // back — must stay linear) and the capped stateful LSH batch
      // drive (the maxBucket guard must hold the curve that the
      // uncapped form loses)
      val lm = best(graft.operators.QualityRules.bigramLmScore(
        docs, "doc_id", "text").count())
      val nds = best(graft.streaming.StatefulOps.streamingNearDupCandidates(
        docs, "doc_id", "text", n = 3, k = 8, bands = 2, maxBucket = 1000).toDF().count())
      println(f"[scale] $label%-4s docs=$nDocs%7d ngram_jaccard=$jac%6.2f minhash_lsh=$lsh%6.2f simhash32=$sim%6.2f simhash63=$sim63%6.2f components=$comp%6.2f tfidf=$tfidf%6.2f pack=$pack%6.2f spans=$spans%6.2f cdc=$cdc%6.2f bm25=$bm25%6.2f kmv=$kmv%6.2f squant=$sq%6.2f lm=$lm%6.2f neardup_stateful=$nds%6.2f")
    }
    bench("1x", args(0))
    bench("2x", args(1))
    bench("8x", args(2))
    // pathological-chain components: a 20k-vertex path graph has
    // diameter 20k — pure min-label propagation would need 20k rounds;
    // the auto-switch hands it to star contraction after `switchAfter`
    // rounds. Measures the switch's value on the shape it exists for.
    locally {
      import spark.implicits._
      val chain = spark.range(0L, 20000L).select(col("id").as("da"), (col("id") + 1).as("db"))
        .localCheckpoint(true)
      def run(switchAfter: Int, label: String): Unit = {
        val t0 = System.nanoTime()
        val (out, st) = graft.operators.Dedup.connectedComponentsWithStats(
          chain, "da", "db", maxIters = 60, switchAfter = switchAfter)
        val n = out.count()
        println(f"[scale] chain $label%-12s -> $n%6d labeled in ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
          s"(propRounds=${st.propRounds} switched=${st.switchedToStar})")
      }
      run(5, "auto-switch")
      run(60, "prop-only") // capped at maxIters: will NOT converge — timing shows the per-round cost it avoids
    }

    // mass-duplicate probe: 10% of docs share ONE boilerplate text, so
    // the shared band bucket grows linearly with the corpus and uncapped
    // all-pairs candidate volume grows QUADRATICALLY; the band-occupancy
    // cap (star-pairing to the bucket min) must hold output linear.
    // Non-duplicate replicas are word-salted per copy so the organic dup
    // rate stays constant across blow-ups.
    locally {
      val boiler = ("breaking news subscribe to our newsletter all rights reserved " * 6).trim
      def massdup(mult: Int) = {
        val base = spark.read.parquet(args(0))
        (0 until mult).map(i => base.select(
            (col("doc_id") + lit(i * 100000000L)).as("doc_id"),
            when(pmod(col("doc_id"), lit(10)) === 0, lit(boiler))
              .otherwise(concat(col("text"), lit(" r" + i))).as("text")))
          .reduce(_ union _)
          .localCheckpoint(true)
      }
      for (m <- Seq(1, 2, 8)) {
        val d = massdup(m)
        def run(cap: Long): (Double, Long) = {
          var n = 0L
          time { n = graft.operators.Dedup.minhashLshCandidates(
            d, "doc_id", "text", n = 3, k = 8, bands = 2, maxBandOccupancy = cap).count(); n }
          val t = time(graft.operators.Dedup.minhashLshCandidates(
            d, "doc_id", "text", n = 3, k = 8, bands = 2, maxBandOccupancy = cap).count())
          (t, n)
        }
        val (tU, nU) = run(Long.MaxValue)
        val (tC, nC) = run(1000L)
        println(f"[scale] massdup ${m}x uncapped=$tU%6.2f s ($nU%9d pairs)  capped@1000=$tC%6.2f s ($nC%9d pairs)")
        // simhash on the same corpus: the identical-fingerprint cluster
        // makes the plain blocked join quadratic; the collapsed variant
        // star-pairs it and joins distinct fingerprints only
        def runSim(collapsed: Boolean): (Double, Long) = {
          def q = if (collapsed)
            graft.operators.Dedup.simhashPairs63Collapsed(d, "doc_id", "text", n = 3, maxHamming = 3)
          else
            graft.operators.Dedup.simhashPairs63(d, "doc_id", "text", n = 3, maxHamming = 3)
          var n = 0L
          time { n = q.count(); n }
          val t = time(q.count())
          (t, n)
        }
        val (tP, nP) = runSim(collapsed = false)
        val (tS, nS) = runSim(collapsed = true)
        println(f"[scale] massdup ${m}x simhash63=$tP%6.2f s ($nP%9d pairs)  collapsed=$tS%6.2f s ($nS%9d pairs)")
      }
    }
    // SemDeDup scale curves, self-contained (synthetic deterministic
    // embeddings, no input dir): 10% of vectors share ONE direction
    // (boilerplate embeddings), the rest are id-hashed pseudo-random.
    // All boilerplate lands in a single IVF list, so the within-list
    // pair stage is quadratic in corpus size there — the
    // maxListOccupancy guard must exclude that list once it outgrows
    // the cap (binds at 8× here), holding cost ~flat. The nList sweep
    // measures the paper's sizing rule (nList ∝ corpus ⇒ constant list
    // size ⇒ linear total pair work).
    locally {
      def syntheticEmb(n: Long) = spark.range(n).select(
        col("id").as("vec_id"),
        when(pmod(col("id"), lit(10)) === 0,
          expr("transform(sequence(0, 15), j -> CAST(1.0 + j AS FLOAT))"))
          .otherwise(expr(
            "transform(sequence(0, 15), j -> CAST(((id * 31 + j * 7919) % 1000 - 500) / 500.0 AS FLOAT))"))
          .as("embedding"))
        .localCheckpoint(true)
      for (m <- Seq(1, 2, 8)) {
        val d = syntheticEmb(2000L * m)
        def run(cap: Long): (Double, Long) = {
          var n = 0L
          time { n = graft.operators.Dedup.semanticPairs(
            d, "vec_id", "embedding", eps = 0.8, nList = 16, maxListOccupancy = cap).count(); n }
          val t = time(graft.operators.Dedup.semanticPairs(
            d, "vec_id", "embedding", eps = 0.8, nList = 16, maxListOccupancy = cap).count())
          (t, n)
        }
        val (tU, nU) = run(Long.MaxValue)
        val (tC, nC) = run(1000L)
        println(f"[scale] semdedup ${m}x uncapped=$tU%6.2f s ($nU%9d pairs)  capped@1000=$tC%6.2f s ($nC%9d pairs)")
      }
      locally {
        val d = syntheticEmb(16000L)
        Seq(16, 128).foreach { nl =>
          var n = 0L
          val t = time { n = graft.operators.Dedup.semanticPairs(
            d, "vec_id", "embedding", eps = 0.8, nList = nl,
            maxListOccupancy = Long.MaxValue).count(); n }
          println(f"[scale] semdedup 8x nList=$nl%3d -> $n%9d pairs in $t%6.2f s")
        }
      }
    }
    // optional 4th arg: an embeddings parquet with heavy duplication —
    // demonstrates the vector-LSH bucket cap holding candidate volume
    // flat where the uncapped run goes quadratic
    args.lift(3).foreach { embPath =>
      val emb = spark.read.parquet(embPath)
      def pairs(cap: Long): (Double, Long) = {
        var n = 0L
        val t = time {
          n = graft.operators.Similarity.lshCandidates(
            emb, "vec_id", "embedding", maxBucket = cap).count(); n
        }
        (t, n)
      }
      val (tU, nU) = pairs(Long.MaxValue)
      val (tC, nC) = pairs(1000L)
      println(f"[scale] emb  uncapped=${tU}%6.2f s ($nU%9d pairs)  capped@1000=${tC}%6.2f s ($nC%9d pairs)")
      // signature width sweep: bucket values per table view = 2^(planes/tables),
      // so candidate volume must drop geometrically as planes grow
      Seq(16, 32, 60).foreach { p =>
        var n = 0L
        val t = time {
          n = graft.operators.Similarity.lshCandidates(
            emb, "vec_id", "embedding", planes = p, tables = 4).count(); n
        }
        println(f"[scale] emb  planes=$p%2d tables=4 -> $n%10d pairs in $t%6.2f s")
      }
      // the SHIPPED entry point with its finite default cap vs uncapped —
      // confirms the threaded cap actually reaches the query path
      Seq(("lshTopK capped@1000", 1000L), ("lshTopK uncapped", Long.MaxValue)).foreach {
        case (label, cap) =>
          var n = 0L
          val t = time {
            n = graft.operators.Similarity.lshTopK(
              emb, "vec_id", "embedding", k = 10, maxBucket = cap).count(); n
          }
          println(f"[scale] emb  $label%-20s -> $n%10d rows in $t%6.2f s")
      }
      // IVF at production-sized nList: the matrix-loop assign/score
      // kernels must hold as the centroid count grows (an inline
      // per-centroid expression array would blow up codegen here)
      Seq(16, 64, 256).foreach { nl =>
        var n = 0L
        val t = time {
          n = graft.operators.Similarity.ivfTopK(
            emb, "vec_id", "embedding", k = 10, nList = nl, nProbe = nl / 4).count(); n
        }
        println(f"[scale] emb  ivfTopK nList=$nl%3d nProbe=${nl / 4}%2d -> $n%10d rows in $t%6.2f s")
      }
    }

    // common-spans on the mass-dup corpus: the 10% boilerplate cluster
    // makes every one of its positional shingles occur in 0.1·n docs,
    // so UNCAPPED pair volume is quadratic in corpus size (measured at
    // 1×/2× only — 8× uncapped is the blow-up the cap exists to stop);
    // maxDocsPerShingle=50 must hold output and runtime near-linear.
    locally {
      def massdup(mult: Int) = {
        val boiler = ("breaking news subscribe to our newsletter all rights reserved " * 6).trim
        val base = spark.read.parquet(args(0))
        (0 until mult).map(i => base.select(
            (col("doc_id") + lit(i * 100000000L)).as("doc_id"),
            when(pmod(col("doc_id"), lit(10)) === 0, lit(boiler))
              .otherwise(concat(col("text"), lit(" r" + i))).as("text")))
          .reduce(_ union _)
          .localCheckpoint(true)
      }
      for (m <- Seq(1, 2, 8)) {
        val d = massdup(m)
        def run(cap: Long): (Double, Long) = {
          var n = 0L
          val t = time { n = graft.operators.Dedup.commonSpans(
            d, "doc_id", "text", n = 5, minSpan = 8, maxDocsPerShingle = cap).count(); n }
          (t, n)
        }
        val (tC, nC) = run(50L)
        val unc = if (m <= 2) { val (tU, nU) = run(Long.MaxValue); f"uncapped=$tU%6.2f s ($nU%9d spans)" }
          else "uncapped=skipped(quadratic)"
        println(f"[scale] cspans ${m}x capped@50=$tC%6.2f s ($nC%9d spans)  $unc")
      }
    }

    // ANN serving shape (the r7 selection rewrite): per-probe top-k
    // selection must scale with candidate volume ≈ probes × corpus ×
    // nProbe/nList. Two curves:
    //  (a) hot-probe: ONE probe × growing corpus, SAME materialized
    //      candidate frame selected via the shipped k-bounded
    //      graft_topk aggregate vs the pre-r7 row_number() window —
    //      the window funnels the probe's whole candidate list
    //      (nProbe/nList × corpus rows) through one task's sort, the
    //      aggregate partial-combines to k rows per partition;
    //  (b) probe-batch: the SHIPPED ivfJoin end-to-end at 1/32/1024
    //      probes on a fixed corpus — index build is the constant
    //      term, probe-side cost must grow ~linearly in probes and
    //      never concentrate in one task.
    locally {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.Similarity
      import graft.functions.{Kernels, TopK}
      def synthEmb(n: Long) = spark.range(n).select(
        col("id").as("vec_id"),
        expr("transform(sequence(0, 15), j -> " +
          "CAST(((id * 31 + j * 7919) % 1000 - 500) / 500.0 AS FLOAT))").as("embedding"))
        .localCheckpoint(true)
      for (m <- Seq(1, 2, 8)) {
        val corpus = synthEmb(32000L * m)
        val unit = Similarity.unitNorm(
          Similarity.ivfCentroids(corpus, "vec_id", "embedding", nList = 16, iters = 2))
        // one probe's candidate list, materialized once so the two
        // selections time ONLY the selection
        val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("nvec"))
          .withColumn("list", Kernels.ivfAssign(col("nvec"), unit))
        val pLists = corpus.filter(col("vec_id") === 3L)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
            posexplode(Kernels.ivfScores(col("embedding"), unit)).as(Seq("c", "s")))
          .orderBy(col("s").desc, col("c").asc).limit(4)
          .select(col("qid"), col("qvec"), col("c").as("list"))
        val cand = pLists.join(c, Seq("list")).filter(col("qid") =!= col("nid"))
          .select(col("qid"), col("nid"),
            Kernels.vecDot(col("qvec"), col("nvec")).as("cos"))
          .localCheckpoint(true)
        val nCand = cand.count()
        val tAgg = time(cand.groupBy("qid")
          .agg(TopK.topkPairsDouble(col("cos"), col("nid"), 10).as("tk"))
          .select(explode(col("tk"))).count())
        val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
        val tWin = time(cand.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10).count())
        println(f"[scale] annsel ${m}x cand=$nCand%8d agg=$tAgg%6.2f s  window=$tWin%6.2f s")
      }
      locally {
        val corpus = synthEmb(256000L)
        for (p <- Seq(1, 32, 1024)) {
          val probes = corpus.filter(pmod(col("vec_id"), lit(256000L / p)) === 3L)
            .localCheckpoint(true)
          val np = probes.count()
          val t = time(Similarity.ivfJoin(probes, corpus, "vec_id", "embedding",
            k = 10, nList = 16, nProbe = 4).count())
          println(f"[scale] annserve probes=$np%5d ivfJoin=$t%6.2f s")
        }
      }
    }

    // k-bounded top-k vs window rank on ONE hot key: both scan n rows,
    // but the window funnels the hot key through a single task's sort
    // while the aggregate partial-combines to k rows per partition
    // before the exchange — the curve gap is the point of TopKPairs.
    locally {
      import org.apache.spark.sql.expressions.Window
      for (m <- Seq(1, 2, 8)) {
        val n = 1000000L * m
        val d = spark.range(n).select(
          when(pmod(col("id"), lit(100)) === 0, concat(lit("src"), pmod(col("id"), lit(7))))
            .otherwise(lit("hot")).as("source"),
          col("id"), pmod(col("id") * 2654435761L, lit(1000000L)).as("score"))
          .localCheckpoint(true)
        val tAgg = time(graft.operators.Sampling.capPerGroup(
          d, "source", col("score"), "id", k = 100).count())
        val w = Window.partitionBy("source").orderBy(col("score").desc, col("id").asc)
        val tWin = time(d.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 100).count())
        println(f"[scale] topk ${m}x rows=$n%9d agg=$tAgg%6.2f s  window=$tWin%6.2f s")
      }
    }
    spark.stop()
  }
}
