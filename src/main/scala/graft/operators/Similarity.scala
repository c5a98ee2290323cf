package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Kernels, TopK}

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query
  *    set against the corpus, rank per query. Corpus is scanned once,
  *    never shuffled by pair.
  *  - [[lshTopK]]: scale path — random-hyperplane signatures bucket the
  *    corpus (one shuffle), candidates re-ranked exactly. Hyperplane
  *    weights are ±1 derived from a deterministic integer hash, so the
  *    index is reproducible job-to-job (re-runs see the same buckets).
  */
object Similarity {

  /** left-to-right double-fold dot product (engine-reproducible),
    * computed by the codegen kernel [[graft.functions.Kernels]]. */
  def dot(a: Column, b: Column): Column = graft.functions.Kernels.vecDot(a, b)

  def norm2(a: Column): Column = graft.functions.Kernels.vecNorm2(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Rows a broadcast query/probe set may hold before the guard fails
    * loud — the [[Guards.assertBroadcastable]] contract shared with
    * fuzzy-match. Ids must be integral (they ride the long-keyed
    * k-bounded heap, like every keep rule in the library).
    */
  private val MaxBroadcastProbes = 100000L

  /** Final k-selection shared by every ANN path: `groupBy(qid)` over
    * the k-bounded [[TopK.topkPairsDouble]] aggregate instead of a
    * `row_number() OVER (PARTITION BY qid)` window. The window funnels
    * each probe's FULL candidate list — the whole corpus for the exact
    * paths, ≈ nProbe/nList × corpus for IVF — through ONE task's sort
    * before dropping all but k; the aggregate combines map-side, so
    * each partition ships ≤ k candidates per probe to the exchange and
    * no task ever holds more than k entries per probe. Tie rule
    * unchanged (ord DESC, id ASC — sortable-bits double order ==
    * Spark's own). Output matches the window form: (qid, rank 1..k,
    * nid).
    */
  private def selectTopK(scored: DataFrame, ordCol: String, k: Int): DataFrame =
    scored.groupBy("qid")
      .agg(TopK.topkPairsDouble(col(ordCol), col("nid"), k).as("__tk"))
      .select(col("qid"), posexplode(col("__tk")).as(Seq("__pos", "__p")))
      .select(col("qid"), (col("__pos") + 1).cast("long").as("rank"), col("__p.id").as("nid"))

  /** The `nProbe` highest-scoring list ids from an [[Kernels.ivfScores]]
    * array, computed ROW-LOCALLY: ascending `array_sort` over
    * struct(−s, c) = (s DESC, c ASC — the shared probe tie rule) on an
    * nList-length array, then slice. Replaces a posexplode + per-probe
    * window — probe-list selection now needs no shuffle at all.
    */
  private def topProbeLists(scores: Column, nProbe: Int): Column =
    transform(
      slice(array_sort(transform(scores, (s, c) => struct((-s).as("ns"), c.as("c")))),
        1, nProbe),
      p => p.getField("c"))

  /** Exact top-k: for each query vector, the k nearest corpus vectors
    * by cosine (descending, id tie-break). Query side is broadcast.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms are computed once per side before the pair join, not per pair
    val q = broadcast(Guards.assertBroadcastable(
      queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
        norm2(col(vecCol)).as("qnrm")),
      MaxBroadcastProbes, "bruteForceTopK query set"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      norm2(col(vecCol)).as("nnrm"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qvec"), col("nvec")) / sqrt(col("qnrm") * col("nnrm"))).as("cos"))
    selectTopK(scored, "cos", k)
  }

  /** sign-signature of a vector under `planes` hyperplanes (bit p set
    * iff Σ_d sign(p,d)·v_d > 0).
    */
  def lshSignature(vec: Column, planes: Int): Column =
    graft.functions.Kernels.lshSig(vec, planes)

  /** Candidate pairs whose signatures agree on at least one of the
    * `tables` bucket views (each view masks a disjoint group of planes).
    *
    * `maxBucket` is the vector-LSH analog of the n-gram frequency cap
    * ([[graft.operators.Dedup.ngramJaccardPairs]] `maxShingleFreq`):
    * a bucket holding more members than that is boilerplate (mass-
    * duplicated embeddings, zero vectors) and is dropped BEFORE the
    * self-join — without it one degenerate bucket generates quadratic
    * pairs in a single reducer at corpus scale. Callers that ship
    * (lshTopK/lshJoin/embeddingCosinePairsBlocked) default to a finite
    * cap; any oracle of a capped run must apply the same cap.
    */
  def lshCandidates(df: DataFrame, idCol: String, vecCol: String,
                    planes: Int = 16, tables: Int = 4,
                    maxBucket: Long = Long.MaxValue): DataFrame = {
    val perTable = planes / tables
    // bucket join and pair-dedup carry only ids — vectors (the wide
    // payload) are joined back afterwards on id, a co-partitioned hash
    // join at scale and an AQE broadcast at bench size
    val sig = df.select(col(idCol).as("id"), lshSignature(col(vecCol), planes).as("sig"))
    val raw = sig.select(col("id"),
      explode(array((0 until tables).map { t =>
        val mask = ((1L << perTable) - 1) << (t * perTable)
        struct(lit(t).as("t"), (col("sig").bitwiseAND(lit(mask))).as("v"))
      }: _*)).as("bucket"))
    val bucketed =
      if (maxBucket == Long.MaxValue) raw
      else dropOversizedBuckets(raw, maxBucket)
    val pairs = bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"))
      .distinct()
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    pairs
      .join(v.as("va"), col("ida") === col("va.id"))
      .join(v.as("vb"), col("idb") === col("vb.id"))
      .select(col("ida"), col("va.vec").as("veca"), col("idb"), col("vb.vec").as("vecb"))
  }

  /** Remove every row of a bucket whose occupancy exceeds `maxBucket`.
    *
    * The over-cap key set comes from a partial-aggregated groupBy (hot
    * keys combine map-side) and is tiny by definition — a handful of
    * boilerplate buckets — so it anti-joins back as a broadcast. A
    * window count over the bucket would funnel every row of the
    * degenerate bucket through ONE task's sort before dropping it —
    * exactly the skewed-key single-task pass the cap exists to avoid.
    */
  private def dropOversizedBuckets(bucketed: DataFrame, maxBucket: Long): DataFrame = {
    val over = bucketed.groupBy("bucket").agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > maxBucket)
      .select("bucket")
    bucketed.join(broadcast(over), Seq("bucket"), "left_anti")
  }

  /** Per-vector symmetric int8 quantization: q_i = round(x_i·127/max|x|)
    * ∈ [−127, 127]. The production memory/bandwidth path — 4× smaller
    * vectors, and candidate scoring becomes pure small-integer dot
    * products (SIMD-friendly on a real cluster). Quantization is
    * engine-exact: float→double casts and the ·127/max chain are IEEE
    * double ops, and round-half-away-from-zero agrees between engines,
    * so an external SQL oracle rebuilds identical codes.
    *
    * Output: (`id`, `q` array<long>, `qnrm` = Σq² — int64, exact).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val mx = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    val q = when(mx === 0d,
        transform(col(vecCol), _ => lit(0L)))
      .otherwise(transform(col(vecCol), x => round(x.cast("double") * 127d / mx).cast("long")))
    df.select(col(idCol).as("id"), q.as("q"))
      // Σq² through the codegen int64-dot kernel (q against itself) —
      // bit-identical to aggregate(q, 0L, (a, x) => a + x*x): same
      // left-to-right wrapping sum (GraftFunctionsSpec pins the kernel
      // against the HOF form)
      .withColumn("qnrm", graft.functions.Kernels.vecDotLong(col("q"), col("q")))
  }

  /** Exact top-k over int8-quantized vectors: per query, the k corpus
    * vectors with the highest quantized cosine. The scale factors
    * cancel out of the cosine of reconstructed vectors, so scoring is
    * an INTEGER dot over int8 codes divided by integer norms — the
    * whole pair loop runs on small integers (the actual int8-ANN win),
    * and the score is deterministic on any engine. Recall vs the
    * full-precision ranking is bounded in OperatorsSpec.
    */
  def int8TopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(Guards.assertBroadcastable(
      quantizeInt8(queries, idCol, vecCol)
        .select(col("id").as("qid"), col("q").as("qq"), col("qnrm").as("qn")),
      MaxBroadcastProbes, "int8TopK query set"))
    val c = quantizeInt8(corpus, idCol, vecCol)
      .select(col("id").as("nid"), col("q").as("nq"), col("qnrm").as("nn"))
    // The pair-scale scoring loop runs |queries|×|corpus| times — the
    // hot path of this operator. aggregate(zip_with(...)) is a
    // CodegenFallback (interpreted lambda per pair); the kernel is the
    // same wrapping int64 left-to-right sum inside whole-stage codegen
    // (bit-parity incl. null/length semantics pinned in
    // GraftFunctionsSpec).
    val intDot = graft.functions.Kernels.vecDotLong(col("qq"), col("nq"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        when(col("qn") === 0 || col("nn") === 0, lit(-2d))
          .otherwise(intDot.cast("double") / sqrt((col("qn") * col("nn")).cast("double")))
          .as("cos"))
    selectTopK(scored, "cos", k)
  }

  // ---- binary sign quantization (1 bit/dim + exact rerank) ----

  /** Sign-bit signature: bit j of block b set iff `vec[32b+j] > 0` —
    * 1 bit per dimension, the most compressed point on the library's
    * quantization ladder (float32 → int8 → PQ → binary; 32× smaller
    * than float, the memory shape that keeps a trillion-vector sign
    * index executor-resident at 100 TB). Blocks pack 32 dims into a
    * long, NOT 64: bit 63 would need 2⁶³, which overflows the signed
    * BIGINT a SQL engine sums when re-deriving the signature — 32-bit
    * blocks keep every intermediate exactly representable on both
    * engines. Zero and negative components clear the bit, so the
    * signature is engine-exact (no float rounding enters — only the
    * sign test). Row-local projection: zero shuffles.
    */
  def binarizeSign(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val pow2 = array((0 until 32).map(j => lit(1L << j)): _*)
    val d = size(col(vecCol))
    val nb = ceil(d.cast("double") / 32d).cast("int")
    val sig = when(d >= 1,
      transform(sequence(lit(0), nb - 1), b =>
        aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, j) => {
          val idx = b * 32 + j + 1
          acc + when(idx <= d && element_at(col(vecCol), idx) > 0f,
            element_at(pow2, j + 1)).otherwise(lit(0L))
        })))
      .otherwise(array().cast("array<bigint>"))
    df.select(col(idCol).as("id"), sig.as("sig"))
  }

  /** Hamming distance between two packed sign signatures — the
    * XOR-popcount loop as a codegen kernel (runs |queries|×|corpus|
    * times in [[binaryRerankTopK]]'s shortlist scan; the HOF form
    * `aggregate(zip_with(a, b, (x, y) => bit_count(x ^ y)), 0L, _+_)`
    * is a CodegenFallback). Bit-parity with the HOF, including its
    * null-on-length-mismatch semantics, is pinned in
    * GraftFunctionsSpec.
    */
  def hammingSig(a: Column, b: Column): Column =
    graft.functions.Kernels.hammingDist(a, b)

  /** Binary-quantized ANN with exact rerank (the faiss
    * IndexBinaryFlat + refine shape): shortlist by signature hamming
    * (ASC, id tie-break), then exact cosine over the shortlist only.
    * The scan side costs bit_count over `dim/32` longs per pair — the
    * XOR-popcount loop that makes sign indexes the fastest first-pass
    * filter — and exact float work is confined to `shortlist`
    * candidates per probe. Same probe-broadcast + k-bounded top-k
    * aggregate discipline as every sibling (no Window, no pair
    * materialization beyond the shortlist).
    */
  def binaryRerankTopK(queries: DataFrame, corpus: DataFrame,
                       idCol: String, vecCol: String, k: Int,
                       shortlist: Int = 50): DataFrame = {
    require(shortlist >= k, s"binaryRerankTopK: shortlist $shortlist must be >= k $k")
    val qs = broadcast(Guards.assertBroadcastable(
      binarizeSign(queries, idCol, vecCol)
        .select(col("id").as("qid"), col("sig").as("qsig")),
      MaxBroadcastProbes, "binaryRerankTopK query set"))
    val cs = binarizeSign(corpus, idCol, vecCol)
      .select(col("id").as("nid"), col("sig").as("nsig"))
    val scored = qs.join(cs, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (-hammingSig(col("qsig"), col("nsig"))).cast("double").as("negham"))
    val short = selectTopK(scored, "negham", shortlist).select("qid", "nid")
    val qv = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      norm2(col(vecCol)).as("qnrm")))
    val nv = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      norm2(col(vecCol)).as("nnrm"))
    val rescored = short.join(nv, "nid").join(qv, "qid")
      .select(col("qid"), col("nid"),
        (dot(col("qvec"), col("nvec")) / sqrt(col("qnrm") * col("nnrm"))).as("cos"))
    selectTopK(rescored, "cos", k)
  }

  // ---- product quantization (Jégou, Douze, Schmid 2011: "Product
  //      Quantization for Nearest Neighbor Search") ----

  /** PQ codebooks: the vector is split into `m` contiguous subspaces
    * and each subspace gets its own `ksub`-codeword quantizer — the
    * SAME deterministic bounded-sample Lloyd as [[ivfCentroids]], run
    * per subspace on the sliced vectors (the training sample is keyed
    * on id, so all subspaces train on the same rows). Memory contract
    * at 100 TB: a row's embedding becomes `m` small codes instead of
    * `dim` floats (64-dim float → 4 codes here = 64× smaller), which
    * is what lets a billion-vector index live in executor memory.
    * Model is m·ksub·(dim/m) floats — broadcast-sized, like every
    * learned artifact in this library, and re-derivable by an external
    * engine because the trainer is engine-exact.
    */
  def pqCodebooks(df: DataFrame, idCol: String, vecCol: String,
                  m: Int = 4, ksub: Int = 8, iters: Int = 2,
                  maxTrainVectors: Int = DefaultTrainVectors): Array[Array[Array[Float]]] = {
    // ONE bounded-sample collect feeds all m subspace trainings (the
    // sample is keyed on id, so every subspace trains on the same rows
    // — unchanged); slicing locally replaces m sample scans + the dim
    // probe job with zero extra jobs. Falls back to the distributed
    // trainer per subspace for over-cap sample requests —
    // `maxTrainVectors` is a real parameter (default = ivfCentroids'
    // default, the shared-sample contract) so the guard can bind.
    if (maxTrainVectors > LocalTrainRowCap) {
      val dim = df.select(size(col(vecCol)).as("d")).head().getInt(0)
      require(dim % m == 0, s"pqCodebooks: dim $dim not divisible into $m subspaces")
      val dsub = dim / m
      return (0 until m).map { s =>
        ivfCentroids(
          df.select(col(idCol), slice(col(vecCol), s * dsub + 1, dsub).as("__sub")),
          idCol, "__sub", ksub, iters, maxTrainVectors)
      }.toArray
    }
    val (ids, vecs) = collectTrainSample(df, idCol, vecCol, maxTrainVectors)
    if (vecs.isEmpty) throw new NoSuchElementException("pqCodebooks: empty corpus")
    val dim = vecs(0).length
    require(dim % m == 0, s"pqCodebooks: dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    // local slice mirrors slice(col, s*dsub+1, dsub): elements
    // [s*dsub, s*dsub+dsub) of each vector (shorter rows slice shorter,
    // exactly like the SQL slice)
    (0 until m).map { s =>
      val sub = vecs.map { v =>
        val from = (s * dsub).min(v.length)
        val until = (s * dsub + dsub).min(v.length)
        java.util.Arrays.copyOfRange(v, from, until)
      }
      lloydLocal(ids, sub, ksub, iters)
    }.toArray
  }

  /** Encode every row to its `m` subspace codes (argmax cosine to the
    * unit-normed codewords, ties → lowest index — the [[ivfCentroids]]
    * assignment rule, one codegen kernel per subspace). Output:
    * (`id`, `pq_code` array<int> of length m).
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               codebooks: Array[Array[Array[Float]]]): DataFrame = {
    val dsub = codebooks(0)(0).length
    val codes = codebooks.zipWithIndex.map { case (cb, s) =>
      graft.functions.Kernels.ivfAssign(
        slice(col(vecCol), s * dsub + 1, dsub), unitNorm(cb))
    }
    df.select(col(idCol).as("id"), array(codes: _*).as("pq_code"))
  }

  /** The reconstruction a code stands for: per subspace, the RAW
    * codeword (the quantized-integer cluster mean — not unit-normed;
    * normalization is only the assignment metric), concatenated back
    * to a dim-length vector. Codebooks are literal columns, so this
    * stays inside whole-stage codegen.
    */
  def pqReconstruct(codeCol: Column, codebooks: Array[Array[Array[Float]]]): Column =
    concat(codebooks.zipWithIndex.map { case (cb, s) =>
      element_at(typedLit(cb.map(_.toSeq).toSeq), codeCol.getItem(s) + 1)
    }: _*)

  /** Asymmetric top-k over PQ codes: full-precision queries scored
    * against code reconstructions (ADC — the query never gets
    * quantized, only the corpus does). Score is the raw inner product
    * (MIPS), ties → lowest id. The corpus side carries `m` ints per
    * row through the scoring join instead of `dim` floats — the PQ
    * bandwidth win; queries broadcast by the small-probe-set contract
    * shared with [[bruteForceTopK]]/[[int8TopK]]. Recall vs the exact
    * ranking is bounded in spec, and rank determinism is engine-exact
    * (reconstructions are identical on any engine, dot folds
    * left-to-right in double on both).
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame,
             idCol: String, vecCol: String, k: Int,
             m: Int = 4, ksub: Int = 8): DataFrame = {
    val cb = pqCodebooks(corpus, idCol, vecCol, m, ksub)
    val enc = pqEncode(corpus, idCol, vecCol, cb)
    val q = broadcast(Guards.assertBroadcastable(
      queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")),
      MaxBroadcastProbes, "pqTopK query set"))
    val c = enc.select(col("id").as("nid"), pqReconstruct(col("pq_code"), cb).as("rvec"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), dot(col("qvec"), col("rvec")).as("ip"))
    selectTopK(scored, "ip", k)
  }

  /** Two-stage retrieval — the production serving pattern: a cheap PQ
    * (ADC) shortlist of `shortlist` candidates per probe, then an
    * EXACT cosine re-rank of only those. Full-precision corpus vectors
    * are read for shortlist rows only — an id-keyed hash join of
    * |probes|·shortlist rows against the corpus — so exact-grade
    * ranking costs O(probes·shortlist·dim) bandwidth instead of the
    * brute-force O(probes·corpus·dim): the composition that makes
    * exact quality affordable once the corpus outgrows executor
    * memory. Both stages select through the k-bounded aggregate.
    */
  def pqRerankTopK(queries: DataFrame, corpus: DataFrame,
                   idCol: String, vecCol: String, k: Int,
                   shortlist: Int = 50, m: Int = 4, ksub: Int = 8): DataFrame = {
    require(shortlist >= k, s"pqRerankTopK: shortlist $shortlist must be >= k $k")
    val short = pqTopK(queries, corpus, idCol, vecCol, shortlist, m, ksub)
      .select(col("qid"), col("nid"))
    // queries were guarded inside pqTopK already; re-broadcast is free
    val qv = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      norm2(col(vecCol)).as("qnrm")))
    val nv = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      norm2(col(vecCol)).as("nnrm"))
    val scored = short.join(nv, "nid").join(qv, "qid")
      .select(col("qid"), col("nid"),
        (dot(col("qvec"), col("nvec")) / sqrt(col("qnrm") * col("nnrm"))).as("cos"))
    selectTopK(scored, "cos", k)
  }

  /** Incremental IVF index maintenance — the continuous-ingest shape:
    * the quantizer stays FROZEN (trained once on the existing corpus;
    * a broadcast-sized model), an incoming batch is assigned to its
    * lists in one map-side kernel pass (no retrain, no corpus
    * re-shuffle), and the output is the per-list occupancy ledger
    * (existing vs incoming counts) — the drift signal an operator
    * watches to decide when list skew warrants a re-train (the
    * nList ∝ corpus sizing rule measured in SCALING.md).
    */
  def ivfAppendStats(corpus: DataFrame, incoming: DataFrame,
                     idCol: String, vecCol: String,
                     nList: Int = 16, iters: Int = 2): DataFrame = {
    val unit = unitNorm(ivfCentroids(corpus, idCol, vecCol, nList, iters))
    def lists(df: DataFrame) = df
      .select(Kernels.ivfAssign(col(vecCol), unit).as("list"))
    val before = lists(corpus).groupBy("list").agg(count(lit(1)).as("n_corpus"))
    val after = lists(incoming).groupBy("list").agg(count(lit(1)).as("n_incoming"))
    // nList-sized frames — the join is model-sized regardless of corpus
    before.join(after, Seq("list"), "full_outer")
      .select(col("list"),
        coalesce(col("n_corpus"), lit(0L)).as("n_corpus"),
        coalesce(col("n_incoming"), lit(0L)).as("n_incoming"))
  }

  /** Embedding-space outlier prune: rows whose cosine to their own
    * nearest IVF centroid falls below `minCos` — far-from-every-
    * cluster vectors are the garbage/mislabeled-embedding signal
    * (encoder failures, zero pads, wrong-modality rows) that SemDeDup
    * and ANN recall both degrade on. One kernel pass per row (the
    * nearest-centroid score is `array_max` over the score vector — no
    * join, no shuffle; the quantizer is the same broadcast model every
    * IVF op shares). Zero-norm vectors are always outliers (cos
    * undefined; scored −2 like [[int8TopK]]'s guard). Output:
    * (id, cos_c) for outliers only — engine-exact doubles, so an
    * external SQL oracle reproduces the exact row set.
    */
  def centroidOutliers(df: DataFrame, idCol: String, vecCol: String,
                       nList: Int = 16, iters: Int = 2,
                       minCos: Double = 0.2): DataFrame = {
    val unit = unitNorm(ivfCentroids(df, idCol, vecCol, nList, iters))
    df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("__best", array_max(Kernels.ivfScores(col("vec"), unit)))
      .withColumn("__nrm", norm2(col("vec")))
      .withColumn("cos_c", when(col("__nrm") === 0d, lit(-2d))
        .otherwise(col("__best") / sqrt(col("__nrm"))))
      .filter(col("cos_c") < minCos)
      .select(col("id"), col("cos_c"))
  }

  /** IVFADC (the Jégou et al. 2011 deployment shape): IVF coarse
    * quantizer prunes the search to `nProbe` lists per probe, and
    * within a list the corpus is scored through PQ codes of the
    * RESIDUAL (vector − its coarse centroid) — residuals are tighter
    * than raw vectors, so the same code budget buys more precision.
    * Reconstruction = coarse centroid + residual codeword concat;
    * probes stay full-precision (asymmetric).
    *
    * All float edits (residual subtract, reconstruction add) go
    * through double and round once back to float — exactly-rounded
    * IEEE on any engine, so the oracle re-derives codes and ranks
    * bit-for-bit. The assigned/residual frame is localCheckpointed:
    * it feeds 4 subspace trainings plus the encode — at production
    * scale this materialization IS the index build (write codes once,
    * serve many probe batches; probe-side work never touches raw
    * corpus vectors again — nProbe/nList of the corpus' CODES per
    * probe is the whole read).
    */
  def ivfPqTopK(probes: DataFrame, corpus: DataFrame,
                idCol: String, vecCol: String, k: Int,
                nList: Int = 16, nProbe: Int = 4,
                m: Int = 4, ksub: Int = 8): DataFrame = {
    val coarse = ivfCentroids(corpus, idCol, vecCol, nList, iters = 2)
    val unit = unitNorm(coarse)
    val coarseLit = typedLit(coarse.map(_.toSeq).toSeq)
    val asg = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("list", Kernels.ivfAssign(col("vec"), unit))
      .withColumn("cvec", element_at(coarseLit, col("list") + 1))
      .withColumn("resid", zip_with(col("vec"), col("cvec"),
        (a, b) => (a.cast("double") - b.cast("double")).cast("float")))
      .select("id", "list", "cvec", "resid")
      .localCheckpoint(true)
    val cb = pqCodebooks(asg, "id", "resid", m, ksub)
    val dsub = cb(0)(0).length
    val codeCols = cb.zipWithIndex.map { case (cbS, s) =>
      Kernels.ivfAssign(slice(col("resid"), s * dsub + 1, dsub), unitNorm(cbS))
    }
    val enc = asg.select(col("id").as("nid"), col("list"),
      zip_with(col("cvec"), pqReconstruct(array(codeCols: _*), cb),
        (a, b) => (a.cast("double") + b.cast("double")).cast("float")).as("rvec"))

    val p = probes.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .select(col("qid"), col("qvec"),
        explode(topProbeLists(Kernels.ivfScores(col("qvec"), unit), nProbe)).as("list"))

    val cand = p.join(enc, Seq("list")).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), dot(col("qvec"), col("rvec")).as("ip"))
    selectTopK(cand, "ip", k)
  }

  /** Quantization scale for the centroid update: float coordinates are
    * rounded to 1/2²⁰ before summing, so the per-cluster mean is pure
    * int64 arithmetic — exact, summation-order-free, and therefore
    * identical on any engine regardless of partitioning. (A double sum
    * would depend on reduce order; 2⁻²⁰ resolution is far below any
    * recall-relevant signal for a coarse quantizer.)
    */
  private val QScale = 1048576L

  /** IVF coarse quantizer: `nList` centroids from `iters` Lloyd
    * iterations. Assignment and centroid updates are distributed
    * (argmax-cosine kernel, posexplode + integer-quantized groupBy
    * mean); only the centroid MODEL (nList × dim floats, a few KB) ever
    * reaches the driver — at 100 TB the corpus never does. Every step
    * (affine-hash-ordered training sample, first-n init, quantized
    * integer mean, truncating division) is deterministic AND
    * SQL-expressible, so an external oracle can rebuild the exact same
    * index — the same reproducibility contract as [[lshSignature]].
    */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String,
                   nList: Int, iters: Int = 2,
                   maxTrainVectors: Int = DefaultTrainVectors): Array[Array[Float]] = {
    if (maxTrainVectors > LocalTrainRowCap)
      return ivfCentroidsDistributed(df, idCol, vecCol, nList, iters, maxTrainVectors)
    // Train the quantizer on a bounded, deterministic hash-ordered
    // sample (standard IVF practice): Lloyd over the FULL corpus would
    // be `iters` extra full passes at 100 TB for no recall benefit —
    // centroid quality saturates far below 100k training vectors. The
    // sample is MODEL-SIZED BY CONTRACT (≤ maxTrainVectors rows — the
    // same order as the broadcast artifacts this library already ships),
    // so Lloyd runs ON THE DRIVER over the collected sample: ONE bounded
    // job instead of 1 init collect + iters×(posexplode shuffle of
    // sample×dim rows + collect [+ reseed sort]) — at bench scale that
    // is 3-6 driver round-trips saved per training, and at 100 TB it
    // removes iters full shuffles of the exploded sample. The
    // full corpus is still assigned to lists distributedly afterwards.
    // Arithmetic is bit-identical to [[ivfCentroidsDistributed]]
    // (spec-pinned): same sample, same init, same kernel fold order,
    // same quantized integer mean, same reseed rule.
    val (ids, vecs) = collectTrainSample(df, idCol, vecCol, maxTrainVectors)
    lloydLocal(ids, vecs, nList, iters)
  }

  /** Rows a training-sample collect may hold before [[ivfCentroids]]
    * falls back to the distributed trainer — callers asking for an
    * over-model-sized sample keep the old shuffle-based path.
    */
  private val LocalTrainRowCap = 1 << 20

  /** The SHARED default training-sample bound: both [[ivfCentroids]]
    * and [[pqCodebooks]] default their `maxTrainVectors` to this one
    * constant, so coarse and subspace quantizers train on the same
    * rows unless a caller explicitly decouples them. */
  private[graft] val DefaultTrainVectors = 100000

  /** The bounded, deterministic, hash-ordered training sample of
    * [[ivfCentroids]], collected to the driver: ≤ maxTrainVectors rows
    * of (id, vec). The sort key reduces id mod P before multiplying so
    * the affine hash never overflows int64 (engines differ on wrap vs
    * error).
    */
  private def collectTrainSample(df: DataFrame, idCol: String, vecCol: String,
                                 maxTrainVectors: Int): (Array[Any], Array[Array[Float]]) = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val trainKey = pmod(pmod(col("id"), lit(Kernels.P)) * lit(1103515245L) + lit(12345L), lit(Kernels.P))
    val rows = v.orderBy(trainKey, col("id")).limit(maxTrainVectors).collect()
    (rows.map(_.get(0)), rows.map(_.getSeq[Float](1).toArray))
  }

  /** Natural JVM ordering for collected id values — identical to
    * Spark's sort order for every id type the ANN family accepts.
    * Nulls first, like Spark ASC NULLS FIRST. Strings compare by
    * UNSIGNED UTF-8 BYTES (UTF8String's binary order — what Spark's
    * UTF8_BINARY sort uses), NOT String.compareTo: the UTF-16
    * code-unit order diverges when supplementary-plane code points
    * (surrogate pairs, 0xD800-prefixed units) mix with U+E000–U+FFFF,
    * and a drifted tie-break here would desync the local trainer's
    * init/reseed from [[ivfCentroidsDistributed]] and the SQL oracle
    * (IvfLocalTrainerSpec pins a non-BMP string-id case).
    */
  private val idOrdering: Ordering[Any] = new Ordering[Any] {
    def compare(x: Any, y: Any): Int = (x, y) match {
      case (null, null) => 0
      case (null, _) => -1
      case (_, null) => 1
      case (a: java.lang.Double, b: java.lang.Double) => java.lang.Double.compare(a, b)
      case (a: java.lang.Float, b: java.lang.Float) => java.lang.Float.compare(a, b)
      case (a: String, b: String) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(a)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
      case (a: Comparable[_], b) => a.asInstanceOf[Comparable[Any]].compareTo(b)
      case _ => throw new IllegalArgumentException(s"unorderable id: $x")
    }
  }

  /** Spark-exact `round(d)` then `cast("long")`: HALF_UP via the
    * decimal string value (java.math.BigDecimal.valueOf — the codegen
    * form of Catalyst Round on doubles), NaN/Infinity passed through
    * the double→long cast like the non-ANSI cast does.
    */
  private def roundToLongQ(d: Double): Long =
    if (d.isNaN || d.isInfinite) d.toLong
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** Driver-local Lloyd over a collected training sample — the exact
    * arithmetic of [[ivfCentroidsDistributed]] in plain loops:
    *  - init: first nList vectors by id ascending;
    *  - assignment: argmax dot against unit-normed centroids, ties →
    *    lowest index, left-to-right double fold (the
    *    [[graft.functions.Kernels.ivfAssignEval]] loop verbatim);
    *  - update: per (cluster, pos) int64 sum of round(x·2²⁰) (order-free
    *    — identical under any partitioning), truncating division, back
    *    to float at 1/2²⁰ resolution;
    *  - reseed: empty lists take the training vectors furthest from the
    *    current centroids (lowest best-dot, ties → lowest id).
    */
  private[graft] def lloydLocal(ids: Array[Any], vecs: Array[Array[Float]],
                                nList: Int, iters: Int): Array[Array[Float]] = {
    val n = vecs.length
    val byId: Array[Int] =
      Array.range(0, n).sortWith((a, b) => idOrdering.compare(ids(a), ids(b)) < 0)
    var centroids: Array[Array[Float]] = byId.take(nList).map(vecs(_))
    for (_ <- 0 until iters) {
      val unit = unitNorm(centroids)
      // assignment — the ivfAssignEval loop on plain float arrays
      val assign = new Array[Int](n)
      var r = 0
      while (r < n) {
        val vec = vecs(r)
        var best = 0
        var bestS = Double.NegativeInfinity
        var i = 0
        while (i < unit.length) {
          val c = unit(i)
          val m = math.min(vec.length, c.length)
          var s = 0.0
          var d = 0
          while (d < m) { s += vec(d).toDouble * c(d).toDouble; d += 1 }
          if (s > bestS) { bestS = s; best = i }
          i += 1
        }
        assign(r) = best
        r += 1
      }
      // quantized integer mean per (cluster, pos); a ragged sample keeps
      // per-pos counts exactly like the posexplode groupBy did
      val sums = Array.fill(centroids.length)(null: Array[Long])
      val cnts = Array.fill(centroids.length)(null: Array[Long])
      r = 0
      while (r < n) {
        val c = assign(r)
        val vec = vecs(r)
        if (sums(c) == null || sums(c).length < vec.length) {
          val ns = new Array[Long](vec.length)
          val nc = new Array[Long](vec.length)
          if (sums(c) != null) {
            System.arraycopy(sums(c), 0, ns, 0, sums(c).length)
            System.arraycopy(cnts(c), 0, nc, 0, cnts(c).length)
          }
          sums(c) = ns; cnts(c) = nc
        }
        var d = 0
        while (d < vec.length) {
          sums(c)(d) += roundToLongQ(vec(d).toDouble * QScale)
          cnts(c)(d) += 1L
          d += 1
        }
        r += 1
      }
      val present = sums.indices.filter(c => sums(c) != null && cnts(c).exists(_ > 0)).toSet
      val empties = centroids.indices.filterNot(present.contains)
      val reseeds: Map[Int, Array[Float]] =
        if (empties.isEmpty || n == 0) Map.empty
        else {
          // best-dot per row (array_max semantics: NaN greatest), then
          // (best ASC, id ASC) — Double.compare puts NaN last like Spark
          val bests = new Array[Double](n)
          var j = 0
          while (j < n) {
            val vec = vecs(j)
            var b = 0.0
            var started = false
            var i = 0
            while (i < unit.length) {
              val c = unit(i)
              val m = math.min(vec.length, c.length)
              var s = 0.0
              var d = 0
              while (d < m) { s += vec(d).toDouble * c(d).toDouble; d += 1 }
              // array_max semantics: NaN is greatest — Double.compare order
              if (!started || java.lang.Double.compare(s, b) > 0) { b = s; started = true }
              i += 1
            }
            bests(j) = b
            j += 1
          }
          val order = Array.range(0, n).sortWith { (a, b) =>
            val c = java.lang.Double.compare(bests(a), bests(b))
            if (c != 0) c < 0 else idOrdering.compare(ids(a), ids(b)) < 0
          }
          empties.zip(order.take(empties.size).map(vecs(_))).toMap
        }
      centroids = centroids.indices.map { c =>
        if (present.contains(c)) {
          // positions with at least one member, ascending — the
          // groupBy(cluster, pos) row set; truncating long division
          // (matches SQL integer //), back to float at 1/QScale
          val s = sums(c); val k = cnts(c)
          s.indices.filter(k(_) > 0L)
            .map(p => ((s(p) / k(p)).toDouble / QScale).toFloat).toArray
        } else reseeds.getOrElse(c, centroids(c))
      }.toArray
    }
    centroids
  }

  /** The shuffle-based trainer [[ivfCentroids]] delegated to before the
    * local form existed — kept as the over-cap fallback (sample sizes
    * past [[LocalTrainRowCap]]) and as the parity reference the local
    * trainer is spec-pinned against. Assignment and centroid updates
    * are distributed (argmax-cosine kernel, posexplode +
    * integer-quantized groupBy mean); only the centroid MODEL reaches
    * the driver.
    */
  private[graft] def ivfCentroidsDistributed(
      df: DataFrame, idCol: String, vecCol: String,
      nList: Int, iters: Int = 2,
      maxTrainVectors: Int = 100000): Array[Array[Float]] = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val trainKey = pmod(pmod(col("id"), lit(Kernels.P)) * lit(1103515245L) + lit(12345L), lit(Kernels.P))
    // the bounded sample is read once per Lloyd pass plus the init —
    // persist it so the scan/sort behind it runs once, not iters+1 times
    val train = v.orderBy(trainKey, col("id")).limit(maxTrainVectors)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids: Array[Array[Float]] = train.orderBy("id").limit(nList)
      .select("vec").collect().map(_.getSeq[Float](0).toArray)
    for (_ <- 0 until iters) {
      val unit = unitNorm(centroids)
      val assigned = train.withColumn("cluster", Kernels.ivfAssign(col("vec"), unit))
      val updated = assigned
        .select(col("cluster"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(sum(round(col("x").cast("double") * QScale).cast("long")).as("q"),
          count(lit(1)).as("cnt"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      val byCluster = updated.groupBy(_._1)
      // Empty clusters reseed to the training vectors FURTHEST from the
      // current centroids (lowest best-dot, ties → lowest id; the j-th
      // empty list by index takes the j-th furthest point) instead of
      // keeping a stale centroid that can stay empty forever. ≤ nList
      // vectors reach the driver — still model-sized traffic. If there
      // are more empty lists than training rows, the tail keeps its old
      // centroid (zip truncates), the only honest option left.
      val empties = centroids.indices.filterNot(byCluster.contains)
      val reseeds: Map[Int, Array[Float]] =
        if (empties.isEmpty) Map.empty
        else empties.zip(
          assigned
            .withColumn("best", array_max(Kernels.ivfScores(col("vec"), unit)))
            .orderBy(col("best").asc, col("id").asc)
            .limit(empties.size)
            .select("vec").collect().map(_.getSeq[Float](0).toArray)).toMap
      centroids = centroids.indices.map { c =>
        byCluster.get(c) match {
          case Some(rows) =>
            // truncating long division (matches SQL integer //), then
            // back to float at 1/QScale resolution
            rows.sortBy(_._2).map(r => ((r._3 / r._4).toDouble / QScale).toFloat).toArray
          case None => reseeds.getOrElse(c, centroids(c))
        }
      }.toArray
    }
    train.unpersist()
    centroids
  }

  /** centroids scaled to unit norm, so argmax cosine(v, c_i) becomes
    * argmax dot(v, ĉ_i) — the row's own norm is constant across i and
    * drops out of the comparison entirely.
    */
  private[graft] def unitNorm(centroids: Array[Array[Float]]): Array[Array[Float]] =
    centroids.map { c =>
      val n = math.sqrt(c.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      if (n == 0.0) c else c.map(x => (x / n).toFloat)
    }

  /** ANN top-k via IVF: corpus vectors live in their nearest-centroid
    * list (one shuffle key); each query probes its `nProbe` closest
    * lists and re-ranks candidates exactly. Recall tunes with
    * nList/nProbe; candidates per query ≈ nProbe/nList of the corpus.
    * Assignment and probe scoring are single kernel calls looping over
    * the centroid matrix ([[graft.functions.Kernels.ivfAssign]]) — at
    * production nList (thousands) an inline per-centroid expression
    * array would blow up codegen; the matrix loop doesn't.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              k: Int, nList: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame =
    ivfJoin(df, df, idCol, vecCol, k, nList, nProbe, iters)

  /** Two-table ANN join through a learned IVF index (the learned-
    * partition counterpart of [[lshJoin]]): the quantizer trains on the
    * CORPUS, corpus vectors live in their nearest-centroid list, and
    * each probe row scans only its `nProbe` closest lists. Candidate
    * volume per probe ≈ nProbe/nList of the corpus — never
    * |probes|×|corpus| — and the join key is the list id, a plain hash
    * join at any scale.
    */
  def ivfJoin(probes: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String,
              k: Int, nList: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    val centroids = ivfCentroids(corpus, idCol, vecCol, nList, iters)
    val unit = unitNorm(centroids)

    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .withColumn("list", Kernels.ivfAssign(col("nvec"), unit))
      .withColumn("nnrm", norm2(col("nvec")))
    // per-query probe lists: the nProbe highest-cosine centroids
    // (unit-normalized, so plain dots order identically to cosines;
    // ties → lowest list index), selected row-locally — no shuffle
    val p = probes.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .select(col("qid"), col("qvec"), norm2(col("qvec")).as("qnrm"),
        explode(topProbeLists(Kernels.ivfScores(col("qvec"), unit), nProbe)).as("list"))

    val cand = p.join(c, Seq("list")).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qvec"), col("nvec")) / sqrt(col("qnrm") * col("nnrm"))).as("cos"))
    selectTopK(cand, "cos", k)
  }

  /** Two-table ANN join (retrieval shape): each probe row gets its top-k
    * LSH-bucketed candidates from `corpus`, exactly re-ranked. Both
    * sides are hashed with the SAME deterministic hyperplane family, so
    * a probe only meets corpus vectors sharing a bucket in at least one
    * table — candidate volume is bucket-occupancy-bound, never
    * |probes|×|corpus|. Ids travel through the bucket join; vectors
    * join back by id.
    *
    * `maxBucket` caps CORPUS-side bucket occupancy (default finite): a
    * corpus bucket holding more vectors than that is boilerplate
    * (mass-duplicated embeddings, zero vectors) whose candidates would
    * multiply against every probe sharing the bucket — it is dropped
    * before the bucket join, same contract as [[lshCandidates]]. The
    * probe side is small by usage and stays uncapped.
    */
  def lshJoin(probes: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String,
              k: Int, planes: Int = 16, tables: Int = 4,
              maxBucket: Long = 1000L): DataFrame = {
    val perTable = planes / tables
    def bucketed(df: DataFrame, side: String) = {
      val sig = df.select(col(idCol).as(s"${side}id"),
        lshSignature(col(vecCol), planes).as("sig"))
      sig.select(col(s"${side}id"),
        explode(array((0 until tables).map { t =>
          val mask = ((1L << perTable) - 1) << (t * perTable)
          struct(lit(t).as("t"), (col("sig").bitwiseAND(lit(mask))).as("v"))
        }: _*)).as("bucket"))
    }
    val nb =
      if (maxBucket == Long.MaxValue) bucketed(corpus, "n")
      else dropOversizedBuckets(bucketed(corpus, "n"), maxBucket)
    val cand = bucketed(probes, "q").join(nb, "bucket")
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
    val qv = probes.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      norm2(col(vecCol)).as("qnrm"))
    val nv = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      norm2(col(vecCol)).as("nnrm"))
    val scored = cand.join(qv, "qid").join(nv, "nid")
      .select(col("qid"), col("nid"),
        (dot(col("qvec"), col("nvec")) / sqrt(col("qnrm") * col("nnrm"))).as("cos"))
    selectTopK(scored, "cos", k)
  }

  /** Recall@k audit — the evaluation operator every approximate index
    * needs before it replaces the exact scan: per probe, how many of
    * the exact top-k the approximate result recovered, in exact
    * integer ppm (`recall_ppm = 10⁶·n_hits DIV n_exact`). Both inputs
    * are (qid, nid[, …]) top-k frames from this module's own
    * operators; a probe the approximate side missed entirely still
    * reports (hits=0), never drops.
    *
    * Plan: one left-semi hash join on (qid, nid) — the ground-truth
    * frame is k·|probes| rows, so the whole audit is probe-sized, not
    * corpus-sized; at 100 TB the expensive parts are the two top-k
    * inputs, which carry their own scale guarantees.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("qid"), col("nid"))
    val x = exact.select(col("qid"), col("nid"))
    val hits = x.join(a, Seq("qid", "nid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    x.groupBy("qid").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), col("n_exact"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("coalesce(n_hits, 0) * 1000000 DIV n_exact").as("recall_ppm"))
  }

  /** ANN top-k via LSH buckets + exact re-rank of candidates.
    * `maxBucket` (finite by default) drops boilerplate buckets before
    * pair generation — see [[lshCandidates]].
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              k: Int, planes: Int = 16, tables: Int = 4,
              maxBucket: Long = 1000L): DataFrame = {
    // score each candidate pair once and mirror it for both directions
    // in the SAME pass — a union of two selects would re-run the whole
    // candidate pipeline (bucket join + cosine) once per branch
    val scored = lshCandidates(df, idCol, vecCol, planes, tables, maxBucket)
      .withColumn("cos", cosine(col("veca"), col("vecb")))
    val sym = scored
      .select(explode(array(
        struct(col("ida").as("qid"), col("idb").as("nid"), col("cos")),
        struct(col("idb").as("qid"), col("ida").as("nid"), col("cos")))).as("p"))
      .select(col("p.qid").as("qid"), col("p.nid").as("nid"), col("p.cos").as("cos"))
    selectTopK(sym, "cos", k)
  }
}
