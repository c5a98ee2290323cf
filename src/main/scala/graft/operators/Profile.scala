package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass data profiling — the first thing a pipeline does to a new
  * 100 TB table: per-column row/null/distinct counts and min/max,
  * computed in a SINGLE aggregation job over one scan (never one job
  * per column) and melted to one row per column.
  *
  * At scale `exactDistinct = false` (default) uses HLL sketches — all
  * counters then come out of one map-side-combined aggregate with no
  * distinct expansion. Exact mode is for small tables and oracle
  * verification; it pays Spark's multi-distinct expand.
  */
object Profile {

  /** Profile `cols` (defaults to every column). Output:
    * (column, n_rows, n_nulls, n_distinct, min_s, max_s) — min/max are
    * cast to string so heterogeneous columns fit one frame; profile
    * numeric-exact columns (integers, strings, dates) when cross-engine
    * string forms must agree.
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
              exactDistinct: Boolean = false): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs = names.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c), 0.02)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // melt: one output row per column, from the single aggregated row
    val perCol = names.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_s"),
        col(s"__mx_$c").as("max_s"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  /** KMV (k-minimum-values) distinct-cardinality sketch per group —
    * the ORACLE-EXACT mergeable counterpart to `approx_count_distinct`:
    * HLL register contents are engine-private, but the k smallest
    * values of a deterministic hash are a pure function of the data,
    * so the whole sketch (and its estimate) is reproducible bit-for-bit
    * in any SQL engine — an auditable cardinality number for a 100 TB
    * profiling pass.
    *
    * Values hash through [[graft.functions.TextFunctions.kmvHash]]
    * into [0, R), R = P·P2 ≈ 1.000000016e18; per group the k smallest
    * DISTINCT hashes are kept (two k-bounded hash aggregations, both
    * with map-side partials — the [[graft.functions.TopK]] aggregate
    * over negated hash keeps shuffle traffic at O(partitions·k)).
    * Estimate: exact `n_kept` when the group holds < k distinct values,
    * else the classic KMV estimator (k−1)·R DIV kth_hash (computed in
    * decimal — (k−1)·R overflows int64).
    *
    * The sketch MERGES by union: k-smallest-of-union = k-smallest of
    * the concatenated kept sets, so per-partition/per-day sketches
    * roll up without touching the raw data (the property the spec
    * pins). Output: (group…, n_kept, kth_hash, est_distinct).
    */
  def distinctKmv(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 64): DataFrame =
    kmvEstimate(distinctKmvSketch(df, groupCols, valueCol, k), groupCols, k)

  /** The raw per-group KMV sketch: `kmv` = the ≤ k smallest distinct
    * hashes, ascending (`array<long>`). This is the ROLLUP artifact —
    * persist one per partition/day/source and [[kmvMerge]] them without
    * re-reading the data.
    */
  def distinctKmvSketch(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, k: Int = 64): DataFrame = {
    require(k >= 2, s"distinctKmvSketch: k must be >= 2, got $k")
    val g = groupCols.map(col)
    df.filter(col(valueCol).isNotNull)
      .select(g :+ graft.functions.TextFunctions.kmvHash(
        col(valueCol).cast("string")).as("__h"): _*)
      .distinct()
      .groupBy(g: _*)
      // top-k by (−h DESC, h ASC) = the k SMALLEST hashes; the
      // aggregate's best-first output order is therefore h ascending
      .agg(graft.functions.TopK.topkPairs(-col("__h"), col("__h"), k).as("__tk"))
      .select(g :+ transform(col("__tk"), p => p.getField("id")).as("kmv"): _*)
  }

  /** Union-merge partial sketches (same k): k-smallest of the distinct
    * union of kept hashes — exactly the sketch of the concatenated
    * data, the property that makes per-partition sketches roll up.
    */
  def kmvMerge(sketches: DataFrame, groupCols: Seq[String],
               k: Int = 64): DataFrame = {
    val g = groupCols.map(col)
    sketches
      .select(g :+ explode(col("kmv")).as("__h"): _*)
      .distinct()
      .groupBy(g: _*)
      .agg(graft.functions.TopK.topkPairs(-col("__h"), col("__h"), k).as("__tk"))
      .select(g :+ transform(col("__tk"), p => p.getField("id")).as("kmv"): _*)
  }

  /** Scalars from a sketch: (group…, n_kept, kth_hash, est_distinct).
    * Exact `n_kept` below k; else (k−1)·R DIV kth_hash. (k−1)·R
    * overflows int64, and decimal `/` rounds HALF_UP at the result
    * scale (a quotient within 5e-7 of an integer would round past the
    * floor) — DIV on decimals is divideToIntegralValue: exact, and
    * exactly DuckDB's HUGEINT `//`.
    */
  def kmvEstimate(sketch: DataFrame, groupCols: Seq[String],
                  k: Int = 64): DataFrame = {
    val R = graft.functions.TextFunctions.P * graft.functions.Kernels.P2
    val g = groupCols.map(col)
    sketch
      .select(g ++ Seq(
        size(col("kmv")).cast("long").as("n_kept"),
        element_at(col("kmv"), size(col("kmv"))).as("kth_hash")): _*)
      .select(g ++ Seq(col("n_kept"), col("kth_hash"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(
            s"(CAST(${k - 1} AS DECIMAL(38,0)) * ${R}L) DIV kth_hash"))
          .as("est_distinct")): _*)
  }

  /** Set-overlap estimation from two KMV sketches ALONE — corpus-level
    * contamination measurement (how much of eval's id/url/text-hash
    * space appears in train?) without ever joining the raw 100 TB
    * corpora: each side reduces to its ≤ k-hash sketch first, the
    * overlap math is row-local array arithmetic on model-sized state.
    *
    * The union sketch U = k smallest of kept(A) ∪ kept(B) is exactly
    * the sketch OF the union (the KMV merge property), and every
    * element of U is a uniform sample of A ∪ B, so the fraction of U
    * present in both kept sets estimates Jaccard(A, B) (Beyer et al.,
    * SIGMOD '07). |U| < k only when BOTH sketches are unsaturated —
    * then U is the exact union and the numbers are exact, the same
    * exact-below-k contract as [[distinctKmv]].
    *
    * Output per group: `j_num` (|U ∩ kept(A) ∩ kept(B)|), `j_den`
    * (|U|), `jaccard_ppm` (j_num·10⁶ DIV j_den), `est_union`,
    * `est_intersection` (jaccard_ppm·est_union DIV 10⁶). All integer —
    * engine-exact.
    */
  def kmvJaccard(skA: DataFrame, skB: DataFrame, groupCols: Seq[String],
                 k: Int = 64): DataFrame = {
    val R = graft.functions.TextFunctions.P * graft.functions.Kernels.P2
    val g = groupCols.map(col)
    val joined = skA.select(g :+ col("kmv").as("__a"): _*)
      .join(skB.select(g :+ col("kmv").as("__b"): _*), groupCols)
      .withColumn("__u", slice(array_sort(array_union(col("__a"), col("__b"))), 1, k))
    joined
      .select(g ++ Seq(
        size(filter(col("__u"), x =>
          array_contains(col("__a"), x) && array_contains(col("__b"), x)))
          .cast("long").as("j_num"),
        size(col("__u")).cast("long").as("j_den"),
        col("__u").as("__u")): _*)
      .withColumn("jaccard_ppm", expr("(j_num * 1000000) DIV j_den"))
      .withColumn("est_union",
        when(col("j_den") < k, col("j_den"))
          .otherwise(expr(
            s"(CAST(${k - 1} AS DECIMAL(38,0)) * ${R}L) DIV element_at(__u, CAST(j_den AS INT))")))
      .withColumn("est_intersection", expr("(jaccard_ppm * est_union) DIV 1000000"))
      .drop("__u")
  }

  /** Equal-width histogram of a numeric column in ONE partial-agg'd
    * aggregation (the profiling companion to the sketch family): values
    * clamp into `bins` buckets over [lo, hi). Bin assignment is a
    * single IEEE double division + floor, identical on any engine, so
    * the whole histogram is oracle-exact. Fixed edges avoid a second
    * min/max pass — at 100 TB chain `profile()` first if the range is
    * unknown.
    *
    * Output: (bin, lo_edge, hi_edge, n) — only non-empty bins, plus an
    * `underflow`/`overflow` clamp into the edge bins.
    */
  def histogram(df: DataFrame, valueCol: String,
                lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, "need bins > 0 and hi > lo")
    val width = (hi - lo) / bins
    val raw = floor((col(valueCol).cast("double") - lo) / width).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit(bins - 1L))
    df.filter(col(valueCol).isNotNull)
      .select(bin.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .withColumn("lo_edge", round(lit(lo) + col("bin") * width, 6))
      .withColumn("hi_edge", round(lit(lo) + (col("bin") + 1) * width, 6))
      .select("bin", "lo_edge", "hi_edge", "n")
  }
}
