package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Gopher-style per-document quality rules (Rae et al. 2021, "Scaling
  * Language Models", App. A; and the C4 heuristics of Raffel et al.
  * 2020) — the standard pre-training corpus filter: each document gets
  * one boolean per rule plus an all-rules `pass` flag, so downstream
  * can either drop failures or audit WHICH rule fired (the audit
  * projection is what quality-curation loops actually consume).
  *
  * Scale shape: a pure narrow projection + filter over codegen
  * built-ins (regexp/array kernels) — no shuffle, no UDF, survives any
  * corpus size by construction. All thresholds are integer
  * cross-multiplications (ratio r ≥ a/b ⇔ num·b ≥ den·a), so engines
  * agree exactly and the DuckDB oracle hash-matches.
  */
object QualityRules {

  /** Thresholds; ratios are expressed as integer numerators over a
    * fixed denominator of 10 (e.g. `minUniquePerTen = 3` ⇔ at least
    * 30% of words distinct). Defaults follow the published rules where
    * the corpus makes them meaningful; mean-word-length bounds are the
    * Gopher [3, 10] in tenths.
    */
  final case class Params(
      minWords: Long = 20L,
      maxWords: Long = 100000L,
      minMeanLenTenths: Long = 30L,
      maxMeanLenTenths: Long = 100L,
      minDistinctStop: Long = 2L,
      minUniquePerTen: Long = 3L,
      minAlphaPerTen: Long = 8L,
      maxSymbolPerTen: Long = 1L)

  val RuleCols: Seq[String] =
    Seq("ok_words", "ok_wordlen", "ok_stop", "ok_unique", "ok_alpha", "ok_symbol")

  /** Append the six rule booleans + `pass` to `df`. One projection;
    * every input column is kept so this composes with any downstream
    * op.
    */
  def ruleFlags(df: DataFrame, textCol: String, p: Params = Params()): DataFrame = {
    val t = col(textCol)
    val nw = TextFunctions.wsTokenCount(t)
    val nc = TextFunctions.nonWsCharCount(t)
    val okWords = nw >= p.minWords && nw <= p.maxWords
    // mean word length in [min,max] tenths: nc/nw ≥ m/10 ⇔ nc·10 ≥ nw·m
    val okLen = nc * 10L >= nw * p.minMeanLenTenths &&
      nc * 10L <= nw * p.maxMeanLenTenths
    val okStop = TextFunctions.distinctStopwordCount(t) >= p.minDistinctStop
    val okUnique = TextFunctions.distinctWordCount(t) * 10L >= nw * p.minUniquePerTen
    val okAlpha = TextFunctions.alphaWordCount(t) * 10L >= nw * p.minAlphaPerTen
    val okSymbol = TextFunctions.symbolCount(t) * 10L <= nw * p.maxSymbolPerTen
    df.withColumn("ok_words", okWords)
      .withColumn("ok_wordlen", okLen)
      .withColumn("ok_stop", okStop)
      .withColumn("ok_unique", okUnique)
      .withColumn("ok_alpha", okAlpha)
      .withColumn("ok_symbol", okSymbol)
      .withColumn("pass",
        okWords && okLen && okStop && okUnique && okAlpha && okSymbol)
  }

  /** Documents surviving every rule, original schema — the filter
    * actually applied before tokenization in a training pipeline.
    */
  def applyRules(df: DataFrame, textCol: String, p: Params = Params()): DataFrame =
    ruleFlags(df, textCol, p)
      .filter(col("pass"))
      .drop(RuleCols :+ "pass": _*)

  /** Corpus-frequency document score — the unigram-LM quality proxy
    * (the CCNet-style signal: a doc made of very rare tokens is noise,
    * OCR garbage, or another language; one made only of ultra-common
    * tokens is boilerplate). Emits per doc the average relative corpus
    * frequency of its words, in ppm, integer arithmetic throughout:
    * `freq_ppm = (Σ_w count(w) · 10⁶) DIV (n_words · N_total)`.
    *
    * Two partial-aggregated shuffles (word counts; per-doc sums) and a
    * word-keyed join — vocabulary is language-bounded, so the count
    * side stays joinable at any corpus size; N_total rides along as a
    * broadcast scalar (one row). Hot words skew the JOIN INPUT, not a
    * reducer: counts are one row per word and the exploded side hashes
    * uniformly over (doc, pos).
    */
  def corpusFrequencyScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // \S+ tokens, not split-on-space: consecutive spaces would mint an
    // empty-string "word" whose corpus count inflates exactly the
    // whitespace-padded boilerplate this signal penalizes, and
    // newline-separated words would fuse into frequency-~1 tokens that
    // score coherent multi-line text as rare-token noise
    val words = df.select(col(idCol).as("doc_id"),
        explode(regexp_extract_all(col(textCol), lit("\\S+"), lit(0))).as("word"))
      .localCheckpoint(false)
    val counts = words.groupBy("word").agg(count(lit(1)).as("__cnt"))
    val total = counts.agg(sum("__cnt").as("__n")).select(col("__n"))
    words.join(counts, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("__cnt").as("sum_freq"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_words"), col("sum_freq"),
        // numerator through decimal(38,0): sum_freq is bounded only by
        // n_words × hottest-word count, so int64 × 1e6 wraps silently
        // past ~9.2e12 (long docs of stopwords on a trillion-token
        // corpus). DIV on decimals still returns BIGINT — same dtype,
        // same values wherever int64 didn't overflow.
        expr("(CAST(sum_freq AS DECIMAL(38,0)) * 1000000) " +
          "DIV (CAST(n_words AS DECIMAL(38,0)) * __n)").as("freq_ppm"))
  }

  /** Corpus-trained bigram language-model quality score — the
    * STATISTICAL quality filter of CCNet/Gopher-style pipelines
    * (train an LM on the corpus, rank documents by how well the LM
    * predicts them), distinct from the heuristic [[ruleFlags]]. The
    * model is the corpus's own bigram table; a document's score is the
    * mean conditional probability of its word bigrams, all in exact
    * integer ppm so any engine reproduces it bit-for-bit:
    *
    *   `lm_ppm = (Σ_{(a,b)} 10⁶·C(a,b) DIV C(a·)) DIV n_bigrams`
    *
    * where `C(a·) = Σ_b C(a,b)` (prefix occurrences), so per-prefix
    * probabilities sum to ≤1 and no smoothing is needed — every doc
    * bigram exists in the corpus by construction. Boilerplate scores
    * HIGH (its bigrams dominate the model), incoherent text LOW — the
    * standard signal, thresholded downstream like `score_ppm`.
    *
    * Scale shape (same discipline as [[corpusFrequencyScore]]): the
    * exploded bigram frame is computed once (localCheckpoint) and
    * feeds (a) one partial-aggregated count shuffle, (b) the
    * prefix-sum over the COUNTS table (vocabulary-sized, not
    * corpus-sized), (c) one hash join back. Hot bigrams skew the join
    * INPUT (one row per bigram on the build side), never a reducer.
    * Docs under 2 tokens have no bigrams and are absent — callers
    * treat missing as unscorable.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = df.select(col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.shingles(col(textCol), 2)).as("bg"))
      .localCheckpoint(false)
    scoreBigrams(bigramLmFrom(bg.select(col("bg"))), bg, joinType = "inner")
  }

  /** A frozen bigram LM — the serving-tier artifact of the quality
    * family, like [[graft.operators.TextSim.Bm25Index]]: train once on
    * a reference corpus (the high-quality set), persist the count
    * frame partitioned by bigram, score candidate batches forever
    * after. `bigrams` is one row per (bigram, bigram count, prefix
    * total) — the prefix total is PRE-JOINED at train time
    * (vocabulary⋈vocabulary), so scoring needs exactly ONE
    * corpus-sized join instead of two.
    */
  final case class BigramLm(bigrams: DataFrame)

  /** Train the [[BigramLm]]: one explode + two partial-aggregated
    * count shuffles (the prefix table aggregates the COUNTS frame, not
    * the corpus) + one vocabulary-sized join. */
  def bigramLm(df: DataFrame, textCol: String): BigramLm =
    bigramLmFrom(df.select(
      explode(graft.functions.TextFunctions.shingles(col(textCol), 2)).as("bg")))

  /** [[bigramLm]] over an already-exploded one-column `bg` frame. */
  private def bigramLmFrom(bg: DataFrame): BigramLm = {
    val bgCounts = bg.groupBy("bg").agg(count(lit(1)).as("__cb"))
    val prefCounts = bgCounts
      .select(element_at(split(col("bg"), " "), 1).as("__w1"), col("__cb"))
      .groupBy("__w1").agg(sum("__cb").as("__cp"))
    BigramLm(bgCounts
      .withColumn("__w1", element_at(split(col("bg"), " "), 1))
      .join(prefCounts, "__w1")
      .select(col("bg"), col("__cb"), col("__cp")))
  }

  /** Score candidate documents against a FROZEN [[BigramLm]] — the
    * real-world usage (CCNet trains on Wikipedia, scores Common
    * Crawl): bigrams unseen by the model contribute 0 ppm (no
    * smoothing mass is invented; a doc of entirely-unseen text scores
    * 0), everything else as [[bigramLmScore]]. Self-scoring a corpus
    * against its own LM equals [[bigramLmScore]] exactly
    * (spec-pinned). ONE left hash join against the vocabulary-sized
    * model frame + one aggregation — no window, model side
    * broadcastable by AQE when the vocabulary is small.
    */
  def bigramLmScoreAgainst(
      model: BigramLm, docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreBigrams(model,
      docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.shingles(col(textCol), 2)).as("bg")),
      joinType = "left")

  private def scoreBigrams(model: BigramLm, bg: DataFrame, joinType: String): DataFrame =
    bg.join(model.bigrams, Seq("bg"), joinType)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        // int64 fast path; a single bigram must occur >9e12 times
        // before the ×1e6 could wrap, then the decimal branch takes
        // over (same value, same bigint dtype — the BM25 pattern).
        // NULL __cb (unseen bigram under a left join) contributes 0.
        sum(expr("""CASE WHEN __cb IS NULL THEN 0
                   |  WHEN __cb <= 9000000000000
                   |  THEN __cb * 1000000 DIV __cp
                   |  ELSE CAST(CAST(__cb AS DECIMAL(38,0)) * 1000000
                   |            DIV __cp AS BIGINT) END""".stripMargin)).as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("__s DIV n_bigrams").as("lm_ppm"))
}
