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
    // references: backtick-quoted so legal-but-hostile top-level names
    // ("user.name" from ingested JSON) resolve as the column, not as a
    // struct-field path; aliases: INDEX-based so the internal names
    // can never contain a dot regardless of input naming
    def ref(c: String): org.apache.spark.sql.Column =
      col("`" + c.replace("`", "``") + "`")
    val aggs = names.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(ref(c)).as(s"__nn_$i"),
        (if (exactDistinct) countDistinct(ref(c))
         else approx_count_distinct(ref(c), 0.02)).as(s"__nd_$i"),
        min(ref(c)).cast("string").as(s"__mn_$i"),
        max(ref(c)).cast("string").as(s"__mx_$i"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // melt: one output row per column, from the single aggregated row
    val perCol = names.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"__nn_$i")).as("n_nulls"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__mn_$i").as("min_s"),
        col(s"__mx_$i").as("max_s"))
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

  /** One-pass data-quality gate for an embedding table — the checks an
    * ANN/SemDeDup pipeline must run BEFORE building an index at 100 TB
    * (a handful of NaN vectors poisons every cosine they touch; a
    * dimension mismatch crashes the kernel mid-build; zero vectors
    * rank nowhere but occupy index lists).
    *
    * ONE aggregation job, all predicates row-local integer/boolean
    * counts (engine-exact, no float aggregates): `n_rows`, `n_null`,
    * `n_wrong_dim` (≠ expectedDim), `n_nan` (any NaN or NULL element —
    * both poison every cosine they touch), `n_zero` (all elements 0),
    * `n_ok` (none of the above).
    */
  def embeddingStats(df: DataFrame, vecCol: String, expectedDim: Int): DataFrame = {
    require(expectedDim > 0, s"embeddingStats: expectedDim must be positive")
    val v = col(vecCol)
    val isNull = v.isNull
    val wrongDim = !isNull && size(v) =!= expectedDim
    // a NULL element poisons cosines exactly like NaN and must not
    // vanish into three-valued logic (exists over no-true-some-null is
    // null -> counted in NO category): null elements count as n_nan
    val hasNan = !isNull && exists(v, x => x.isNull || isnan(x))
    // null-safe: an element of unknown zero-ness makes the vector
    // definitively NOT all-zero (it is already in n_nan)
    val isZero = !isNull && size(v) > 0 && forall(v, x => coalesce(x === 0f, lit(false)))
    def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    df.agg(
      count(lit(1)).as("n_rows"),
      cnt(isNull).as("n_null"),
      cnt(wrongDim).as("n_wrong_dim"),
      cnt(hasNan).as("n_nan"),
      cnt(isZero).as("n_zero"),
      cnt(!isNull && !wrongDim && !hasNan && !isZero).as("n_ok"))
  }

  /** Oracle-exact approximate quantiles via a DETERMINISTIC uniform
    * sample — the auditable counterpart to `percentile_approx`'s
    * engine-private sketch (`dd_quantile_sketch` can only bound-check
    * it; this one hash-matches across engines).
    *
    * Per group, the k rows whose [[graft.functions.TextFunctions
    * .kmvHash]] of the row KEY is smallest form a uniform k-sample of
    * the group (hash order is independent of the value), exactly the
    * KMV membership rule — so the sample MERGES like the sketch does
    * (k-smallest of unioned part-samples = the whole-data sample) and
    * re-runs/engines agree row for row, where `TABLESAMPLE`/`rand()`
    * do not. Quantiles are type-1 (lower) order statistics of the
    * sorted sample: `p` maps to element 1 + (p·(m−1)) DIV 100 — an
    * exact element, no interpolation float math. Groups below k
    * degrade to exact quantiles of the whole group.
    *
    * Plan: k-bounded top-k aggregate on (−hash, key), join back on
    * (group, key) for the values (co-partitioned hash join; sampled
    * side is |groups|·k), then a k-bounded sorted-array aggregation —
    * no window, no global sort. `keyCol` must be numeric and unique
    * per (group, key); duplicate keys would enter the sample together
    * and skew weights.
    *
    * Output: group cols, `n_sampled`, one `p<N>` column per requested
    * percent.
    */
  def sampleQuantiles(df: DataFrame, groupCols: Seq[String],
                      keyCol: String, valueCol: String,
                      k: Int = 256, percents: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(k >= 1, s"sampleQuantiles: k must be >= 1, got $k")
    require(percents.nonEmpty && percents.forall(p => p >= 0 && p <= 100),
      s"sampleQuantiles: percents must be in [0,100], got $percents")
    val g = groupCols.map(col)
    val hashed = df
      .filter(col(valueCol).isNotNull)
      .select(g ++ Seq(col(keyCol).as("__key"),
        graft.functions.TextFunctions.kmvHash(col(keyCol).cast("string")).as("__h")): _*)
    val sampledKeys = hashed.groupBy(g: _*)
      .agg(graft.functions.TopK.topkPairs(-col("__h"), col("__key"), k).as("__tk"))
      .select(g :+ explode(transform(col("__tk"), p => p.getField("id"))).as("__key"): _*)
    val vals = sampledKeys.join(
      df.select(g ++ Seq(col(keyCol).cast("long").as("__key"),
        col(valueCol).as("__v")): _*),
      groupCols :+ "__key")
    val agg = vals.groupBy(g: _*)
      .agg(sort_array(collect_list(col("__v"))).as("__s"),
        count(lit(1)).as("n_sampled"))
    agg.select(g ++ (col("n_sampled") +: percents.map(p =>
      element_at(col("__s"),
        (expr(s"($p * (n_sampled - 1)) DIV 100") + 1).cast("int")).as(s"p$p"))): _*)
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
