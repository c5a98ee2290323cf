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

  /** Fuzzy decontamination: flag train docs that are NEAR-duplicates of
    * an eval doc (exact shared n-grams miss paraphrased leakage). Both
    * sides take the same MinHash band keys as
    * [[Dedup.minhashLshCandidates]]; a train doc is flagged iff it
    * shares any band bucket with any eval doc. The eval band set
    * broadcasts — corpus-side cost is one signature pass + broadcast
    * semi-join, no corpus shuffle.
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
}
