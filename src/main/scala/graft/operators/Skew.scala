package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins and aggregations.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.*`) is the
  * runtime backstop, but it only splits SortMergeJoin partitions after
  * materializing them; when one key dominates a fact-fact join, salting
  * removes the hot reducer BEFORE the shuffle:
  *
  *  - big side: append a deterministic salt in [0, n) per row, so the
  *    hot key spreads over n reducers. Deterministic (hash of the whole
  *    row, not rand()) so retried tasks and re-runs produce identical
  *    partitioning — a correctness requirement under speculative
  *    execution.
  *  - other side: replicate each row n times (one per salt value).
  *
  * Join result is exactly the plain join (proven in SkewSpec). Cost:
  * the replicated side's shuffle volume × n — use for genuinely hot
  * keys, ideally after isolating them (`hotKeys` + union of salted hot
  * / plain cold paths).
  */
object Skew {

  /** deterministic per-row salt in [0, n): xxhash64 over all columns. */
  def salt(df: DataFrame, n: Int, saltCol: String = "__salt"): DataFrame = {
    // n = 0 would make the salt NULL (pmod by zero) and n <= 0 would
    // explode an empty array in replicate — either silently EMPTIES a
    // salted join instead of failing the "Result == plain join" contract
    require(n >= 1, s"Skew.salt: salt count must be >= 1, got $n")
    df.withColumn(saltCol, pmod(xxhash64(df.columns.map(col): _*), lit(n)).cast("int"))
  }

  /** replicate each row once per salt value in [0, n). */
  def replicate(df: DataFrame, n: Int, saltCol: String = "__salt"): DataFrame = {
    require(n >= 1, s"Skew.replicate: salt count must be >= 1, got $n")
    df.withColumn(saltCol, explode(array((0 until n).map(lit): _*)))
  }

  /** Salted inner equi-join: `big` is salted, `other` replicated, the
    * join key becomes (keys..., salt). Result == plain join.
    */
  def saltedJoin(
      big: DataFrame, other: DataFrame, joinExpr: Column, n: Int): DataFrame = {
    val saltCol = "__graft_salt"
    val b = salt(big, n, saltCol)
    val o = replicate(other, n, saltCol)
    b.join(o, joinExpr && b(saltCol) === o(saltCol))
      .drop(b(saltCol)).drop(o(saltCol))
  }

  /** keys whose frequency exceeds `threshold` — for isolating the hot
    * path (salted) from the cold path (plain join).
    */
  def hotKeys(df: DataFrame, keyCol: String, threshold: Long): DataFrame =
    df.groupBy(keyCol).agg(count(lit(1)).as("n")).filter(col("n") > threshold).select(keyCol)

  /** Two-stage salted aggregation for hot grouping keys: partial
    * aggregate on (keys, salt) spreads a dominant key over `n`
    * reducers, the final aggregate on keys combines the partials.
    * Emits `cnt` plus `sum_<col>` for each of `sums` — algebraic
    * aggregates, so the result is EXACTLY the direct groupBy (the
    * final stage is keyed on group cardinality, not row volume).
    * Spark's map-side partial aggregation covers in-task combining;
    * the salt matters when one reducer KEY dominates the exchange.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], n: Int,
                sums: Seq[String] = Nil): DataFrame = {
    val saltCol = "__graft_salt"
    val partial = salt(df, n, saltCol)
      .groupBy((keys :+ saltCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"), sums.map(c => sum(c).as(s"__sum_$c")): _*)
    partial.groupBy(keys.map(col): _*)
      .agg(sum("__cnt").as("cnt"), sums.map(c => sum(s"__sum_$c").as(s"sum_$c")): _*)
  }
}
