package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse TF-IDF cosine similarity over raw text — the lexical
  * neighbor to the embedding-space operators in [[Similarity]]: finds
  * document pairs whose *term-weight* vectors are close, without any
  * embedding model in the loop.
  *
  * Same inverted-index discipline as [[Dedup.ngramJaccardPairs]]: pairs
  * are generated per posting list (documents sharing a term), never
  * from the O(n²) pair space, and a term-frequency cap bounds every
  * posting list so a stopword-grade hot term cannot produce a
  * quadratic reducer at 100 TB.
  *
  * All scoring is integer: weight = tf·1000 DIV df (the integer-scaled
  * TF-IDF used by the top-terms operator), dot products and norms are
  * int64 sums, and the cosine threshold num/√(na·nb) ≥ tNum/tDen is
  * evaluated as tDen²·num² ≥ tNum²·na·nb in decimal — no float ever
  * enters, so pair membership is bit-identical on any engine.
  */
object TextSim {

  /** Document pairs with integer TF-IDF cosine ≥ tNum/tDen.
    *
    * Output: `da`, `db`, `num` (weighted dot), `na`, `nb` (squared
    * norms). Plan: four key-partitioned shuffles — (doc,term) tf,
    * term posting lists, doc norms, pair accumulation — each with
    * map-side partial aggregation.
    */
  def tfidfCosinePairs(
      df: DataFrame, idCol: String, textCol: String,
      tNum: Int = 1, tDen: Int = 2,
      maxTermDocs: Long = 1000L): DataFrame = {
    require(tNum >= 0 && tDen > 0, "threshold must be a non-negative ratio")
    val tf = df
      .select(col(idCol).as("doc"),
        explode(filter(split(col(textCol), " "), w => w =!= "")).as("w"))
      .groupBy("doc", "w").agg(count(lit(1)).as("tf"))
    // posting list per term; df = list size, so the weight is computed
    // inside the same projection (floor of a small-integer ratio is
    // exact in double — cannot sit within one ulp of an integer)
    val inv = tf.groupBy("w")
      .agg(collect_list(struct(col("doc"), col("tf"))).as("ps"))
      .filter(size(col("ps")) <= maxTermDocs)
      .select(transform(col("ps"), p =>
        struct(p("doc").as("doc"),
          floor((p("tf") * 1000L) / size(col("ps"))).cast("long").as("wt"))).as("ps"))
    val entries = inv.select(explode(col("ps")).as("e"))
      .select(col("e.doc").as("doc"), col("e.wt").as("wt"))
    val norms = entries.groupBy("doc").agg(sum(col("wt") * col("wt")).as("nrm"))
    // ordered pairs per posting list: the product terms accumulate into
    // the pair's weighted dot in one aggregation
    val pairs = inv
      .select(explode(col("ps")).as("a"), col("ps"))
      .select(col("a.doc").as("da"), col("a.wt").as("wa"), explode(col("ps")).as("b"))
      .where(col("da") < col("b.doc"))
      .select(col("da"), col("b.doc").as("db"), (col("wa") * col("b.wt")).as("prod"))
      .groupBy("da", "db").agg(sum("prod").as("num"))
    // exact BigInteger cross-multiplication (Kernels.cosineGteEval): a
    // decimal(15,0) formulation would silently null-and-drop any pair
    // whose operand passes ~1e15 (possible: wt is unbounded by doc
    // length for rare terms). The int64 sums feeding it are the only
    // remaining bound — overflow needs a single posting-list dot or
    // norm ≥ 2^63, i.e. ~10⁹-token documents at max weight.
    pairs
      .join(norms.as("sa"), col("da") === col("sa.doc"))
      .join(norms.as("sb"), col("db") === col("sb.doc"))
      .select(col("da"), col("db"), col("num"),
        col("sa.nrm").as("na"), col("sb.nrm").as("nb"))
      .filter(graft.functions.Kernels.cosineGte(col("num"), col("na"), col("nb"), tNum, tDen))
  }

  /** BM25-style lexical top-k retrieval: for each probe query, the k
    * highest-scoring corpus documents — the lexical twin of the ANN
    * `*TopK` family (term match instead of embedding cosine), the
    * retrieval half of a retrieval-augmented data pipeline.
    *
    * Scoring is the BM25 shape (k1 = 6/5, b = 3/4) with every quantity
    * integer so ranking is bit-identical on any engine:
    *
    *   score(q,d) = Σ_{t ∈ terms(q)} (idf_t · tf · 22 · avgdl)
    *                  DIV (10·avgdl·tf + 3·avgdl + 9·dl)
    *   idf_t      = ((N − df)·2 + 1) · 1000 DIV (df·2 + 1)
    *
    * which is idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with the
    * rational cleared through 10·avgdl, and idf the classic
    * (N−df+0.5)/(df+0.5) ratio ×1000 WITHOUT the log — kept rational
    * for exactness; monotone in df like the original but weighting
    * rare terms harder (documented divergence from log-idf BM25).
    * avgdl = Σdl DIV N (floor — one global integer).
    *
    * Scale: the probe set broadcasts (guarded); corpus terms with
    * df > maxTermDocs are dropped BEFORE the term join (stopword
    * shedding — same cap discipline as [[tfidfCosinePairs]]'s
    * `maxTermDocs`), so per-term fan-out is bounded and no hot term
    * creates a quadratic reducer. Selection is the k-bounded
    * [[graft.functions.TopK]] aggregate — map-side partials, no
    * per-query window. Candidate volume is Σ_t df_t over query terms,
    * never |queries|×|corpus|.
    *
    * Output: `qid`, `rank` (1..k by score DESC, doc id ASC), `nid`,
    * `score` (int64, scale 1000·idf-units). Docs sharing no surviving
    * term with a query are absent (score-0 rows are not emitted).
    */
  def bm25TopK(
      corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int = 10,
      maxTermDocs: Long = 100000L,
      maxQueries: Long = 100000L): DataFrame =
    bm25TopKAgainst(bm25Index(corpus, idCol, textCol, maxTermDocs),
      queries, qIdCol, qTextCol, k, maxQueries)

  /** A frozen BM25 index: `postings` (one row per (term, doc) with tf,
    * doc length and term df — the per-term statistics fully joined, so
    * query time is ONE term join) and `stats` (the 1-row N/avgdl
    * frame). The serving-tier artifact of the lexical family, like the
    * ANN index builds: persist `postings` partitioned/bucketed by
    * `__w` and re-use across query batches; rebuild when the corpus
    * version changes.
    */
  final case class Bm25Index(postings: DataFrame, stats: DataFrame)

  /** Build the [[Bm25Index]] for a corpus. Terms with df > maxTermDocs
    * are shed HERE (stopword-grade posting lists never reach disk).
    * Plan: one tokenize pass feeds tf; dl and corpus stats are
    * row-local on the token arrays; df is one aggregation over tf.
    */
  def bm25Index(corpus: DataFrame, idCol: String, textCol: String,
                maxTermDocs: Long = 100000L): Bm25Index = {
    val words = (c: Column) => filter(split(c, " "), w => w =!= "")
    val toks = corpus
      .select(col(idCol).as("__doc"), words(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) > 0)
    // tf feeds both the df aggregation and the postings join; measured
    // at sf0.1 the double evaluation is NOT the cost center (the
    // term join dominates — this corpus's 31-word vocabulary makes
    // every posting list ~78% of the corpus; real Zipf vocabularies
    // shed exactly those lists through maxTermDocs), so tf stays an
    // unmaterialized view rather than paying an eager checkpoint
    val tf = toks
      .select(col("__doc"), explode(col("__ws")).as("__w"))
      .groupBy("__doc", "__w").agg(count(lit(1)).as("__tf"))
    // dl/N/avgdl are ROW-LOCAL on the token arrays (array size), never
    // an aggregation over tf; the 1-row stats frame broadcasts into the
    // scoring join — nothing is collected
    val dl = toks.select(col("__doc"), size(col("__ws")).cast("long").as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__n"), sum("__dl").as("__tot"))
      .select(col("__n"), expr("__tot DIV __n").as("__avgdl"))
    val dfreq = tf.groupBy("__w").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxTermDocs)
    val postings = tf.join(dfreq, "__w").join(dl, "__doc")
      .select(col("__w"), col("__doc"), col("__tf"), col("__df"), col("__dl"))
    Bm25Index(postings, stats)
  }

  /** Query a (possibly persisted) [[Bm25Index]]: broadcast the probe
    * terms, one hash join against the postings, two k-bounded
    * aggregations. `bm25TopK(corpus, …) == bm25TopKAgainst(
    * bm25Index(corpus), …)` exactly (spec-pinned).
    */
  def bm25TopKAgainst(
      index: Bm25Index, queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int = 10, maxQueries: Long = 100000L): DataFrame = {
    require(k > 0, s"bm25TopKAgainst: k must be positive, got $k")
    val words = (c: Column) => filter(split(c, " "), w => w =!= "")
    // distinct query terms (BM25 ignores query-side tf); probe side is
    // model-sized and broadcast behind the guard
    val qt = broadcast(Guards.assertBroadcastable(
      queries
        .select(col(qIdCol).as("__qid"), explode(words(col(qTextCol))).as("__w"))
        .distinct(),
      maxQueries, "bm25TopKAgainst query-term set"))
    // The per-document term contribution (idf, tf/length normalization)
    // depends ONLY on the posting row and the corpus stats — never on
    // which query matched it — so it is computed per POSTING before the
    // probe join (the "impact score" a real search index precomputes):
    // the heavy integer/decimal CASE arithmetic runs |postings| times,
    // not |postings|·|matching queries| times, and the score is the
    // same int64 sum of the same values per (query, doc). On the
    // all-stopword adversarial corpus (ta_bm25: every term matches
    // ~every probe) this cuts the scoring arithmetic ~50×.
    //
    // Postings are SEMI-JOINED against the distinct probe-term set
    // BEFORE the scoring projection (r17, ADVICE r16): the r16 shape
    // paid the impact arithmetic for every posting in the index even
    // when a small selective query batch matched a sliver of it — the
    // regression case for a large persisted index. The semi join is
    // one broadcast hash probe per posting (strictly cheaper than the
    // CASE chains it gates), drops nothing the scoring join would
    // have kept, and on the adversarial all-match corpus it is a
    // no-op that the A/B measured inside noise.
    val qw = broadcast(qt.select("__w").distinct())
    val scored = index.postings
      .join(qw, Seq("__w"), "left_semi")
      .crossJoin(broadcast(index.stats))
      // Overflow-safe exact arithmetic WITHOUT paying decimal on the
      // hot path: with int64, idf (~667·N for rare terms) times
      // tf·22·avgdl silently wraps past ~6e14 docs in non-ANSI Spark
      // while the DuckDB oracle's BIGINT errors. A blanket
      // DECIMAL(38,0) intermediate fixes that but benched 3.2× slower
      // (the scoring join is the cost center), so each step guards
      // cheaply in int64 and falls back to decimal ONLY when its
      // operands could actually overflow — the fast branch is the one
      // taken at every realistic corpus size, and both branches are
      // value-identical (DIV is integral either way; same bigint
      // schema). Residual bound: the idf itself fits int64 for
      // N ≲ 1.3e16 documents — document-count beyond any corpus.
      .select(col("__w"), col("__doc"), col("__tf"), col("__dl"), col("__avgdl"),
        // (2N+1)·1000 fits int64 iff N ≤ 4.6e15
        expr("""CASE WHEN __n <= 4600000000000000
               |  THEN ((__n - __df) * 2 + 1) * 1000 DIV (__df * 2 + 1)
               |  ELSE CAST((((CAST(__n AS DECIMAL(38,0)) - __df) * 2 + 1) * 1000)
               |            DIV (__df * 2 + 1) AS BIGINT) END""".stripMargin)
          .as("__idf"))
      .select(col("__w"), col("__doc"),
        // numerator safe iff idf ≤ ⌊⌊max/22⌋/avgdl⌋/tf (floor divisions
        // only under-approximate, so the guard is conservative);
        // denominator safe under the 1e8 operand caps (10·1e16+12·1e8)
        expr("""CASE WHEN __avgdl <= 100000000 AND __tf <= 100000000
               |          AND __dl <= 100000000
               |          AND __idf <= ((9223372036854775807 DIV 22)
               |                        DIV __avgdl) DIV __tf
               |  THEN (__idf * __tf * 22 * __avgdl)
               |       DIV (10 * __avgdl * __tf + 3 * __avgdl + 9 * __dl)
               |  ELSE CAST((CAST(__idf AS DECIMAL(38,0)) * __tf * 22 * __avgdl)
               |       DIV (CAST(10 AS DECIMAL(38,0)) * __avgdl * __tf
               |            + 3 * __avgdl + 9 * __dl) AS BIGINT) END""".stripMargin)
          .as("__contrib"))
      .join(qt, "__w")
      .groupBy("__qid", "__doc").agg(sum("__contrib").as("__score"))
    scored.groupBy("__qid")
      // topkPairsFor: string corpus ids (URLs, UUIDs) ride the
      // string-id heap — the long-id fast path would null-cast and
      // return empty top-k lists for every query
      .agg(graft.functions.TopK.topkPairsFor(scored, col("__score"), col("__doc"), k).as("__tk"))
      .select(col("__qid").as("qid"), posexplode(col("__tk")).as(Seq("__pos", "__p")))
      .select(col("qid"), (col("__pos") + 1).cast("long").as("rank"),
        col("__p.id").as("nid"), col("__p.ord").as("score"))
  }
}
