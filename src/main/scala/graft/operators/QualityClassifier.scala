package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the fastText-style curation step
  * (Joulin et al. 2016: linear model over hashed n-gram features;
  * the shape CCNet/DCLM/LLaMA-style pipelines use to scale a weak
  * "quality" signal from a labeled seed to the whole crawl): hashed
  * BIGRAM features ([[Topics.featureHash]] with n = 2, plus a bias
  * slot) into logistic regression trained by full-batch gradient
  * descent, with a HARD sigmoid (σ̂(t) = clamp(½ + t∕4, 0, 1) — the
  * standard piecewise-linear surrogate from quantized training) so
  * every training step is exact int64 arithmetic: no exp(), whose
  * last-ulp differences across engines would drift the weights.
  *
  * Fixed-point discipline (everything SQL-re-derivable):
  *   - features x: signed bigram counts (exact ints) + bias 1
  *   - weights w: int64 at scale S = 2²⁰ (real weight = w∕S)
  *   - margin z = Σ w·x (int64; the real logit is z∕S)
  *   - u₄ = clamp(2S + z, 0, 4S) — 4S·σ̂(z∕S), division-free
  *   - residual e₄ = 4S·y − u₄; gradient g_j = Σ_docs e₄·x_j
  *   - update w_j += g_j ∕ (lrDen·n) — TRUNCATING division, the one
  *     rounding per iteration, identical in Java `/` and DuckDB `//`
  *
  * Scale shape ([[Similarity.ivfCentroids]]'s trainer discipline):
  * the trainer runs on a bounded deterministic hash-ordered sample
  * (≤ `maxTrainDocs`), its features are checkpointed once, and each
  * iteration is one map-side-combined aggregation whose result is the
  * MODEL-sized gradient (dim+1 longs) — the only driver traffic.
  * Serving ([[scoreAgainst]]) is a pure row-local projection against
  * the broadcast weight vector: zero shuffles, so it drops unchanged
  * into a streaming `readStream → select → writeStream` like
  * [[Topics.assignTopics]] and [[QualityRules]]' frozen-LM path.
  */
object QualityClassifier {

  /** fixed-point weight scale. */
  val Scale: Long = 1L << 20

  /** bigram features + trailing bias slot: length dim+1 float array
    * of exact integer values (featureHash sums + bias 1).
    */
  private def features(text: Column, dim: Int): Column =
    concat(Topics.featureHash(text, dim, n = 2), array(lit(1f)))

  /** margin z = Σ w_j·x_j as an int64 Column — the codegen'd
    * [[graft.functions.VecAgg.dotWLong]] kernel with the weights
    * embedded in the expression (fvec values are exact integers, so
    * the long conversion loses nothing).
    */
  private def margin(f: Column, weights: Array[Long]): Column =
    graft.functions.VecAgg.dotWLong(f, weights)

  /** Train integer LR weights (length dim+1, bias last) on the rows
    * where `labelCol` (0/1) is the target. Full-batch hard-sigmoid
    * gradient descent, `iters` passes; per pass one distributed
    * aggregation returns the (dim+1)-long gradient to the driver.
    */
  def trainWeights(
      df: DataFrame, idCol: String, textCol: String, labelCol: Column,
      dim: Int = 256, iters: Int = 12, lrDen: Long = 2L,
      maxTrainDocs: Int = 100000): Array[Long] = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim must be a power of two, got $dim")
    if (maxTrainDocs > LocalTrainRowCap)
      return trainWeightsDistributed(df, idCol, textCol, labelCol, dim, iters, lrDen, maxTrainDocs)
    // The training sample is MODEL-SIZED BY CONTRACT (≤ maxTrainDocs
    // rows of (dim+1) small-int features), so the GD loop runs ON THE
    // DRIVER over the collected sample — ONE bounded job instead of a
    // checkpoint + count + one gradient aggregation job per iteration
    // (12 driver round-trips at the default). Arithmetic is
    // bit-identical to [[trainWeightsDistributed]] (spec-pinned): int64
    // margin dot, hard-sigmoid residual, int64 gradient sums
    // (order-free), truncating division.
    val trainKey = pmod(
      pmod(col(idCol), lit(graft.functions.Kernels.P)) * lit(1103515245L) + lit(12345L),
      lit(graft.functions.Kernels.P))
    val rows = df.filter(col(textCol).isNotNull)
      .orderBy(trainKey, col(idCol))
      .limit(maxTrainDocs)
      .select(features(col(textCol), dim).as("f"),
        coalesce(labelCol.cast("long"), lit(0L)).as("y"))
      .collect()
    val n = rows.length.toLong
    var w = Array.fill(dim + 1)(0L)
    if (n == 0) return w
    val fs: Array[Array[Float]] = rows.map(_.getSeq[Float](0).toArray)
    val ys: Array[Long] = rows.map(_.getLong(1))
    for (_ <- 0 until iters) {
      val g = new Array[Long](dim + 1)
      var r = 0
      while (r < fs.length) {
        val f = fs(r)
        // margin: the dotWLongEval loop (Σ f_j.toLong · w_j, min-length)
        var z = 0L
        val m = math.min(f.length, w.length)
        var j = 0
        while (j < m) { z += f(j).toLong * w(j); j += 1 }
        val u = math.min(math.max(2 * Scale + z, 0L), 4 * Scale)
        val e = ys(r) * (4 * Scale) - u
        // gradient: the GradVecSum update loop (Σ f_j.toLong · e)
        val gm = math.min(f.length, g.length)
        j = 0
        while (j < gm) { g(j) += f(j).toLong * e; j += 1 }
        r += 1
      }
      // truncating int64 division — matches DuckDB's `//` exactly
      w = w.indices.map(j => w(j) + g(j) / (lrDen * n)).toArray
    }
    w
  }

  /** Rows the bounded-sample collect may hold before [[trainWeights]]
    * falls back to the distributed gradient loop (the
    * [[Similarity.ivfCentroids]] cap discipline).
    */
  private val LocalTrainRowCap = 1 << 20

  /** The aggregation-based trainer [[trainWeights]] delegated to before
    * the local loop existed — kept as the over-cap fallback and the
    * parity reference the local trainer is spec-pinned against
    * (QualityClassifierSpec).
    */
  private[graft] def trainWeightsDistributed(
      df: DataFrame, idCol: String, textCol: String, labelCol: Column,
      dim: Int = 256, iters: Int = 12, lrDen: Long = 2L,
      maxTrainDocs: Int = 100000): Array[Long] = {
    // bounded deterministic sample, the ivfCentroids discipline: GD over
    // the full corpus would be `iters` extra 100 TB passes for no
    // accuracy benefit — the sample is feature-built ONCE and snapshotted
    val trainKey = pmod(
      pmod(col(idCol), lit(graft.functions.Kernels.P)) * lit(1103515245L) + lit(12345L),
      lit(graft.functions.Kernels.P))
    val feats = df.filter(col(textCol).isNotNull)
      .orderBy(trainKey, col(idCol))
      .limit(maxTrainDocs)
      // NULL label (e.g. a zero-word doc's NULL quality-score ratio)
      // counts as class 0 — totalizes the operator and matches the SQL
      // oracle's CASE ... ELSE 0; leaving it NULL would make the
      // gradient aggregate silently skip the row in one engine only
      .select(features(col(textCol), dim).as("f"),
        coalesce(labelCol.cast("long"), lit(0L)).as("y"))
      .localCheckpoint(true)
    val n = feats.count()
    var w = Array.fill(dim + 1)(0L)
    if (n == 0) return w
    for (_ <- 0 until iters) {
      val z = margin(col("f"), w)
      val e4 = (col("y") * lit(4 * Scale) -
        least(greatest(lit(2 * Scale) + z, lit(0L)), lit(4 * Scale))).as("e")
      // gradient: one [[VecAgg.gradVecSum]] pass — each partition
      // partial-aggregates to a single (dim+1)-long vector, the merge
      // is model-sized, and the driver receives exactly the gradient.
      // (A posexplode+groupBy formulation planned the residual Project
      // above the Generate: the margin re-evaluated per SLOT, 257× per
      // doc — measured 43 s/query before this shape.)
      val g = feats.select(col("f"), e4)
        .agg(graft.functions.VecAgg.gradVecSum(col("f"), col("e"), dim + 1).as("g"))
        .head().getSeq[Long](0)
      // truncating int64 division — matches DuckDB's `//` exactly
      w = w.indices.map(j => w(j) + g(j) / (lrDen * n)).toArray
    }
    w
  }

  /** Score rows against a FROZEN weight vector: (idCol, keep…, margin,
    * prob_ppm, pred) — margin is the raw fixed-point logit,
    * prob_ppm = ⌊4S·σ̂ · 10⁶ ∕ 4S⌋ the hard-sigmoid probability in
    * ppm, pred the 0/1 label (margin > 0). Pure row-local projection:
    * zero shuffles, streaming-composable. `keep` names input columns
    * to carry through the projection (e.g. the routing key a
    * downstream per-group stage needs) — a post-hoc join back to the
    * input for them would be a full extra shuffle.
    */
  def scoreAgainst(weights: Array[Long], df: DataFrame,
                   idCol: String, textCol: String,
                   keep: Seq[String] = Nil): DataFrame = {
    val dim = weights.length - 1
    val scored = df.filter(col(textCol).isNotNull)
      .select(col(idCol) +: keep.map(col) :+
        margin(features(col(textCol), dim), weights).as("margin"): _*)
    // two-step projection: margin (O(dim·words)) is evaluated once —
    // CollapseProject keeps multi-referenced non-cheap aliases apart
    val u4 = least(greatest(lit(2 * Scale) + col("margin"), lit(0L)), lit(4 * Scale))
    scored.select(
      col(idCol) +: keep.map(col) :+ col("margin") :+
      // u4 ≥ 0, so the shift IS truncating division by 4S — `//` in SQL
      shiftright(u4 * lit(1000000L), 22).as("prob_ppm") :+
      when(col("margin") > 0, 1).otherwise(0).as("pred"): _*)
  }

  /** Train on `df` (against the weak `labelCol` signal) and score the
    * SAME corpus — the self-labeling curation pass.
    */
  def classify(df: DataFrame, idCol: String, textCol: String, labelCol: Column,
               dim: Int = 256, iters: Int = 12, lrDen: Long = 2L,
               maxTrainDocs: Int = 100000): DataFrame =
    scoreAgainst(
      trainWeights(df, idCol, textCol, labelCol, dim, iters, lrDen, maxTrainDocs),
      df, idCol, textCol)
}
