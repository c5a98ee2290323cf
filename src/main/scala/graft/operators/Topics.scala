package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Kernels

/** Embed-free topic clustering for corpus balance — the curation step
  * between raw source labels (too coarse: "web" hides 1000 topics) and
  * embedding clusters (need a GPU encoder pass over 100 TB first):
  * feature-hashed bag-of-words vectors ("hashing trick", Weinberger et
  * al. 2009) clustered by the SAME deterministic bounded-sample Lloyd
  * quantizer every IVF op uses ([[Similarity.ivfCentroids]]).
  *
  * Everything is engine-exact and SQL-re-derivable: word keys come from
  * the packed polynomial [[Kernels.shingleHashes]] (n = 1), the hashed
  * index is `key mod dim`, the sign is bit-parity of `key div dim`
  * (key ≥ 0, so truncating and floor division agree on any engine),
  * per-feature sums are integers, and the quantizer is the shared
  * integer-quantized Lloyd. A topic column this cheap enables
  * topic-balanced sampling ([[Sampling.capPerGroup]] keyed on the
  * topic) without ever shipping an embedding.
  *
  * Scale shape: the feature build is a ROW-LOCAL projection (zero
  * shuffles — a doc's vector never leaves its row), and assignment is
  * a map-side kernel call against the broadcast centroid model — no
  * joins, no pair space, no window anywhere. Against a pre-trained
  * model, `featureHash` + [[Kernels.ivfAssign]] drop unchanged into a
  * `readStream` select (live topic labeling).
  */
object Topics {

  /** (id, fvec): `dim`-length float array, fvec[i] = Σ sign(w) over
    * words hashing to index i. Sums are exact integers cast to float
    * (exact below 2²⁴ — a doc would need 16M repeats of one feature to
    * lose a bit). Null text rows are dropped (no words, no vector).
    *
    * Computed ROW-LOCALLY (collection expressions over the word-hash
    * array): a doc's vector never leaves its row, so the feature build
    * is a pure map — ZERO shuffles where the obvious
    * explode → groupBy(id, idx) → re-assemble plan pays two — and the
    * projection drops unchanged into `readStream` (assign topics on a
    * live stream against a frozen model). O(dim·words) integer ops per
    * row — orders of magnitude cheaper than shuffling the exploded
    * words at 100 TB.
    */
  def featureHashVectors(df: DataFrame, idCol: String, textCol: String,
                         dim: Int = 64): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), featureHash(col(textCol), dim).as("fvec"))

  /** The row-local feature-hash projection itself — usable directly in
    * a streaming select. Per index i: Σ over word n-grams with
    * `key mod dim = i` of the bit-parity sign of `key div dim`
    * (`n = 1` bag-of-words for topics; `n = 2` bigram features for the
    * trained quality classifier, fastText-style).
    *
    * `dim` must be a power of two so both reductions are exact bit ops
    * (`key & (dim−1)`, bit log₂dim of the key): `/` on long Columns is
    * DOUBLE division, which silently loses integer exactness past 2⁵³
    * — the packed word keys reach ~10¹⁸. The word-hash kernel runs
    * ONCE per row (bound via a one-element-array transform), then each
    * index folds over the bound array.
    */
  def featureHash(text: org.apache.spark.sql.Column, dim: Int = 64,
                  n: Int = 1): org.apache.spark.sql.Column = {
    require(dim > 0 && (dim & (dim - 1)) == 0,
      s"featureHash: dim must be a power of two, got $dim")
    // native kernel ([[Kernels.featureHashEval]]): one unboxed
    // O(grams + dim) pass per row. The equivalent pure-Column HOF
    // formulation (per-index filter+aggregate over the hash array) is
    // O(dim·grams) INTERPRETED lambda evals — measured ~10 ms/doc at
    // dim = 256, which made the quality classifier's feature pass
    // 50 s at sf0.1.
    Kernels.featureHash(text, dim, n)
  }

  /** (id, topic): every doc labeled with its nearest-centroid topic
    * (argmax cosine over unit-normed centroids, ties → lowest index —
    * the shared IVF assignment rule). The centroid model is
    * nTopics × dim floats — broadcast-sized at any corpus scale.
    */
  def topicClusters(df: DataFrame, idCol: String, textCol: String,
                    nTopics: Int = 8, dim: Int = 64, iters: Int = 2): DataFrame = {
    val fv = featureHashVectors(df, idCol, textCol, dim)
      // feeds the trainer (multiple passes) AND the final assignment —
      // snapshot so the explode+aggregate feature build runs once
      .localCheckpoint(true)
    val unit = Similarity.unitNorm(
      Similarity.ivfCentroids(fv, "id", "fvec", nTopics, iters))
    fv.select(col("id"), Kernels.ivfAssign(col("fvec"), unit).as("topic"))
  }

  /** Label rows against a FROZEN centroid model (train offline via
    * [[topicClusters]]'s trainer on a corpus snapshot) — a pure
    * projection with zero shuffles, so it composes into a streaming
    * `readStream → select → writeStream` unchanged: live topic
    * labeling at ingest, same deployment shape as
    * [[graft.streaming.StatefulOps.streamingSemanticCandidates]]'
    * pre-trained quantizer.
    */
  def assignTopics(df: DataFrame, centroids: Array[Array[Float]],
                   idCol: String, textCol: String): DataFrame = {
    // fail fast with the actual problem: an empty model would AIOOBE on
    // centroids(0) with no hint, and a non-power-of-two dim would only
    // surface later from featureHash's internals
    require(centroids.nonEmpty, "assignTopics: centroid model is empty")
    require(centroids(0).nonEmpty && (centroids(0).length & (centroids(0).length - 1)) == 0,
      s"assignTopics: model dim ${centroids(0).length} must be a positive power of two " +
        "(featureHash bucket space)")
    val unit = Similarity.unitNorm(centroids)
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        Kernels.ivfAssign(featureHash(col(textCol), centroids(0).length), unit).as("topic"))
  }

  /** Topic-balanced curation: at most `k` best rows per topic by
    * `ordCol` — [[topicClusters]] composed with the k-bounded
    * [[Sampling.capPerGroup]] aggregate (never a window). Returns
    * (id, topic, ord) for the kept rows.
    */
  def topicBalancedSample(df: DataFrame, idCol: String, textCol: String,
                          ordCol: org.apache.spark.sql.Column, k: Int,
                          nTopics: Int = 8, dim: Int = 64): DataFrame = {
    val topics = topicClusters(df, idCol, textCol, nTopics, dim)
    val withTopic = df.select(col(idCol).as("id"), ordCol.as("__ord"))
      .join(topics, "id")
    Sampling.capPerGroup(withTopic, "topic", col("__ord"), "id", k)
      .select(col("id"), col("topic"), col("ord"))
  }
}
