package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Eval-set decontamination: flag (and drop) training documents that
  * share any word n-gram with a held-out evaluation set — the standard
  * benchmark-leakage guard run before training.
  *
  * Scale shape: the eval side is always the small side (benchmarks are
  * thousands of docs, the corpus is billions), so its distinct n-gram
  * set BROADCASTS and the corpus is decided in one narrow pass — the
  * corpus is never shuffled, and the only wide op is the per-doc
  * distinct-gram explode feeding the broadcast hash join. Matching is
  * on the exact n-gram string; swap in [[TextFunctions.charHash]] keys
  * if gram strings outgrow the broadcast budget.
  */
object Decontaminate {

  /** Adds `contaminated` to every `train` row: true iff the doc shares
    * at least one `n`-gram with `eval`'s text.
    */
  def flag(train: DataFrame, eval: DataFrame,
           idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val evalGrams = broadcast(
      eval.select(explode(TextFunctions.shingles(col(textCol), n)).as("g")).distinct())
    val hit = train
      .select(col(idCol).as("__id"),
        explode(array_distinct(TextFunctions.shingles(col(textCol), n))).as("g"))
      .join(evalGrams, "g")
      .select(col("__id")).distinct()
      .withColumn("contaminated", lit(true))
    train.join(hit, train(idCol) === hit("__id"), "left")
      .drop("__id")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
  }

  /** The decontaminated corpus: `train` minus every flagged doc. */
  def apply(train: DataFrame, eval: DataFrame,
            idCol: String, textCol: String, n: Int = 13): DataFrame =
    flag(train, eval, idCol, textCol, n)
      .filter(!col("contaminated")).drop("contaminated")

  /** STREAMING-composable flag: the eval gram set is collected once
    * (guarded — eval sets are small by contract) and the per-doc check
    * becomes a pure row-local `exists` over the doc's shingles — no
    * join, no distinct, no state, so it drops into a `readStream`
    * transform chain unchanged (the ingest-time decontamination shape:
    * every arriving doc checked map-side against the benchmark set).
    * Batch-driving equals [[flag]] exactly, which is how the oracle
    * gates it. At 100 TB the corpus side is untouched either way; this
    * variant trades [[flag]]'s broadcast JOIN for a broadcast SET —
    * same bound, streaming-legal operators.
    */
  def flagStreaming(train: DataFrame, eval: DataFrame,
                    idCol: String, textCol: String, n: Int = 13,
                    maxEvalGrams: Long = 10000000L): DataFrame = {
    val grams = Guards.assertBroadcastable(
        eval.select(explode(TextFunctions.shingles(col(textCol), n)).as("g")).distinct(),
        maxEvalGrams, "decontamination eval gram set")
      .collect().map(_.getString(0)).toSet
    train.withColumn("contaminated",
      // coalesce: a null-text row's shingles are null -> exists is
      // null; flag() drops the same row at its explode and left-join
      // coalesces to false, so the streaming twin must also say false
      // (a bare null would get DROPPED by filter(!contaminated),
      // silently diverging from the pinned batch-equals contract)
      coalesce(
        exists(array_distinct(TextFunctions.shingles(col(textCol), n)),
          g => g.isInCollection(grams)),
        lit(false)))
  }

  /** [[flag]] with a Bloom pre-filter — the 100 TB shape when the eval
    * n-gram set is large: a sketch of the eval grams (fpp-tunable, a
    * few MB instead of the gram strings) rides into a codegen
    * expression, and the corpus-side gram stream is thinned MAP-SIDE
    * before anything reaches the exact confirm join. Bloom filters
    * have no false negatives, and every sketch hit is confirmed
    * against the exact broadcast gram set, so the result is IDENTICAL
    * to [[flag]] — same oracle, different constant factor: the join
    * input shrinks from every corpus gram to (true hits + fpp of the
    * rest).
    */
  def flagWithBloom(train: DataFrame, eval: DataFrame,
                    idCol: String, textCol: String, n: Int = 13,
                    fpp: Double = 0.01): DataFrame = {
    // eager snapshot of the (benchmark-sized) eval gram set: the count,
    // the sketch build, and the confirm join must all see the SAME
    // grams — a gram appearing only in a recomputation would bypass the
    // sketch and become a false negative. GC-managed, nothing leaks.
    val evalGrams = eval
      .select(explode(TextFunctions.shingles(col(textCol), n)).as("g")).distinct()
      .localCheckpoint(true)
    val m = math.max(1L, evalGrams.count())
    val bloom = evalGrams.stat.bloomFilter("g", m, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val hit = train
      .select(col(idCol).as("__id"),
        explode(array_distinct(TextFunctions.shingles(col(textCol), n))).as("g"))
      .filter(graft.functions.Kernels.bloomMightContain(col("g"), bytes))
      .join(broadcast(evalGrams), "g")
      .select(col("__id")).distinct()
      .withColumn("contaminated", lit(true))
    train.join(hit, train(idCol) === hit("__id"), "left")
      .drop("__id")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
  }

  /** Fuzzy decontamination: flag train docs that are NEAR-duplicates of
    * an eval doc (exact shared n-grams miss paraphrased leakage). Both
    * sides take the same MinHash band keys as
    * [[Dedup.minhashLshCandidates]]; a train doc is flagged iff it
    * shares any band bucket with any eval doc. The eval band set
    * broadcasts — corpus-side cost is one signature pass + broadcast
    * semi-join, no corpus shuffle.
    *
    * Docs with no word `n`-gram (fewer than n words, null text) have
    * no minhash identity and produce NO band keys
    * ([[graft.functions.Hashing.lshBandKeys]]) — so a two-word eval
    * answer can never fuzzy-flag every short train doc; use [[flag]]
    * with a smaller n for short-text contamination.
    */
  def fuzzyFlag(train: DataFrame, eval: DataFrame,
                idCol: String, textCol: String,
                n: Int = 3, k: Int = 8, bands: Int = 2): DataFrame = {
    import graft.functions.Hashing
    def bandKeys(df: DataFrame) = df.select(col(idCol).as("__id"),
      explode(Hashing.lshBandKeys(
        Hashing.minhashSignature(TextFunctions.shingles(col(textCol), n), k),
        k, bands)).as("band"))
    val evalBands = broadcast(bandKeys(eval).select("band").distinct())
    val hit = bandKeys(train).join(evalBands, "band")
      .select("__id").distinct()
      .withColumn("contaminated", lit(true))
    train.join(hit, train(idCol) === hit("__id"), "left")
      .drop("__id")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
  }

  /** Graded contamination: instead of [[flag]]'s binary verdict, the
    * FRACTION of each train doc's distinct `n`-grams that appear in the
    * eval set — reported as exact integer parts-per-million
    * (`hits·10⁶ DIV n_grams`, so both engines agree bit-for-bit). The
    * graded score is what leakage POLICY needs: a 13-gram hit from a
    * ubiquitous idiom should down-weight, not delete, while a doc whose
    * grams are 40% benchmark text is a verbatim leak (GPT-3 appendix C
    * and PaLM §C both use overlap thresholds, not any-hit).
    *
    * Same 100 TB scan/shuffle shape as [[flag]] (eval grams broadcast,
    * the corpus is never shuffled except the per-doc-id aggregation on
    * the id the data is already narrow in) but NOT the same output
    * shape: unlike [[flag]] (row-preserving, adds a column), this
    * returns a SCORE TABLE keyed by `idCol` — `(idCol, n_grams, hits,
    * hit_ppm)`, one row per id — for the caller to join back. If ids
    * repeat, same-id rows aggregate as one logical document (gram and
    * hit counts sum, per-row multiplicities and all, so `hit_ppm` stays
    * ≤ 10⁶). Docs too short to have any n-gram score 0.
    */
  def overlapScore(train: DataFrame, eval: DataFrame,
                   idCol: String, textCol: String, n: Int = 13): DataFrame = {
    require(!Seq("n_grams", "hits", "hit_ppm").contains(idCol),
      s"overlapScore: idCol [$idCol] collides with an output column")
    val evalGrams = broadcast(
      eval.select(explode(TextFunctions.shingles(col(textCol), n)).as("g")).distinct())
    val hits = train
      .select(col(idCol).as("__id"),
        explode(array_distinct(TextFunctions.shingles(col(textCol), n))).as("g"))
      .join(evalGrams, Seq("g"), "left_semi")
      .groupBy("__id").agg(count(lit(1)).as("__hits"))
    train
      .select(col(idCol),
        size(array_distinct(TextFunctions.shingles(col(textCol), n))).cast("long").as("n_grams"))
      .groupBy(idCol).agg(sum("n_grams").as("n_grams"))
      .join(hits, col(idCol) === col("__id"), "left")
      .drop("__id")
      .withColumn("hits", coalesce(col("__hits"), lit(0L))).drop("__hits")
      .withColumn("hit_ppm",
        when(col("n_grams") > 0, expr("(hits * 1000000) DIV n_grams")).otherwise(lit(0L)))
  }
}
