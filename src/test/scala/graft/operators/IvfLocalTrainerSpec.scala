package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The driver-local Lloyd trainer must reproduce the distributed
  * trainer BIT-FOR-BIT: same bounded hash-ordered sample, same init,
  * same argmax-dot assignment fold, same quantized integer mean, same
  * empty-list reseed rule. The DuckDB oracles re-derive the quantizer
  * from these exact rules, so any drift here is a correctness failure,
  * not a perf regression.
  */
class IvfLocalTrainerSpec extends SparkSpec {
  import spark.implicits._

  private def assertSame(a: Array[Array[Float]], b: Array[Array[Float]], what: String): Unit = {
    assert(a.length == b.length, s"$what: centroid count ${a.length} != ${b.length}")
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(java.util.Arrays.equals(x, y),
        s"$what: centroid $i differs: ${x.toSeq} vs ${y.toSeq}")
    }
  }

  test("local == distributed on the bench embeddings (all SFs shapes)") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    for (nList <- Seq(4, 16); iters <- Seq(1, 2)) {
      val local = Similarity.ivfCentroids(emb, "vec_id", "embedding", nList, iters)
      val dist = Similarity.ivfCentroidsDistributed(emb, "vec_id", "embedding", nList, iters)
      assertSame(local, dist, s"nList=$nList iters=$iters")
    }
  }

  test("local == distributed through the empty-cluster reseed path") {
    // 4 identical vectors then 3 orthogonal ones: clusters 1-3 start
    // empty and must reseed identically (furthest point, ties → id)
    val df = (
      (1L to 4L).map(i => (i, Array(1f, 0f, 0f, 0f))) ++ Seq(
        5L -> Array(0f, 1f, 0f, 0f),
        6L -> Array(0f, 0f, 1f, 0f),
        7L -> Array(0f, 0f, 0f, 1f))).toDF("id", "vec")
    assertSame(
      Similarity.ivfCentroids(df, "id", "vec", nList = 4, iters = 2),
      Similarity.ivfCentroidsDistributed(df, "id", "vec", nList = 4, iters = 2),
      "reseed path")
  }

  test("local == distributed on ragged / zero / negative vectors") {
    // ragged lengths exercise the per-(cluster,pos) count path; negative
    // components exercise HALF_UP away-from-zero rounding; a zero vector
    // exercises the all-zero-dot assignment ties
    val df = Seq(
      (1L, Array(0.25f, -0.75f, 0.5f)),
      (2L, Array(-1.5f, 2.5f)),
      (3L, Array(0f, 0f, 0f)),
      (4L, Array(3.14159f, -2.71828f, 1.41421f)),
      (5L, Array(-0.0000005f, 0.0000005f, -1f)),
      (6L, Array(7f))).toDF("id", "vec")
    for (nList <- Seq(2, 3); iters <- Seq(1, 3)) {
      assertSame(
        Similarity.ivfCentroids(df, "id", "vec", nList, iters),
        Similarity.ivfCentroidsDistributed(df, "id", "vec", nList, iters),
        s"ragged nList=$nList iters=$iters")
    }
  }

  test("local == distributed when the sample cap binds") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    assertSame(
      Similarity.ivfCentroids(emb, "vec_id", "embedding", 4, 2, maxTrainVectors = 37),
      Similarity.ivfCentroidsDistributed(emb, "vec_id", "embedding", 4, 2, maxTrainVectors = 37),
      "capped sample")
  }

  test("local == distributed on string-keyed rows") {
    // string ids ride the same natural order in both engines (the
    // affine train key needs numerics, so key on a numeric-castable
    // string? no — the trainer hashes id mod P, which on strings casts;
    // use numeric-looking strings to keep both paths defined)
    val df = Seq(
      ("10", Array(1f, 0f)), ("2", Array(0f, 1f)),
      ("33", Array(1f, 1f)), ("4", Array(-1f, 0.5f))).toDF("id", "vec")
    assertSame(
      Similarity.ivfCentroids(df, "id", "vec", 2, 2),
      Similarity.ivfCentroidsDistributed(df, "id", "vec", 2, 2),
      "string ids")
  }

  test("lloydLocal orders SUPPLEMENTARY-PLANE string ids by UTF-8 bytes, not UTF-16 units") {
    // U+1F600 (surrogate pair D83D DE00; UTF-8 F0 9F 98 80) vs
    // U+FFFD (UTF-8 EF BF BD): Java String.compareTo orders the
    // surrogate FIRST (0xD83D < 0xFFFD) while Spark's UTF8_BINARY sort
    // orders it LAST (0xF0 > 0xEF) -- the divergence ADVICE r16
    // flagged. The distributed trainer cannot run on these ids at all
    // (the affine train key's string->numeric cast errors under ANSI),
    // so pin lloydLocal's init DIRECTLY: with nList == n and iters = 0,
    // the centroids ARE the vectors in id order, and Spark's binary
    // order puts the U+FFFD id first. A UTF-16 comparator flips them.
    val ids: Array[Any] = Array("\ud83d\ude00a", "\ufffda")
    val vecs = Array(Array(1f, 0f), Array(0f, 1f))
    val cents = Similarity.lloydLocal(ids, vecs, nList = 2, iters = 0)
    assert(cents(0).toSeq == Seq(0f, 1f) && cents(1).toSeq == Seq(1f, 0f),
      s"init order must follow UTF-8 byte order (U+FFFD < U+1F600): ${cents.map(_.toSeq).toSeq}")
  }

  test("pqCodebooks honors an over-cap maxTrainVectors by falling back to the distributed trainer") {
    // the r16 guard compared two constants and was statically dead
    // (ADVICE r16) — maxTrainVectors is a real parameter now; the
    // over-cap path must produce the same codebooks as the local one
    // (same sample: the corpus is far below either bound)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val local = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 2, ksub = 4)
    val dist = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 2, ksub = 4,
      maxTrainVectors = (1 << 20) + 1)
    local.zip(dist).zipWithIndex.foreach { case ((l, d), s) =>
      assertSame(l, d, s"subspace $s (over-cap fallback)")
    }
  }

  test("pqCodebooks (shared-sample local slices) == per-subspace distributed") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val local = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 4, ksub = 8)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val dsub = dim / 4
    val dist = (0 until 4).map { s =>
      Similarity.ivfCentroidsDistributed(
        emb.select(col("vec_id"), slice(col("embedding"), s * dsub + 1, dsub).as("__sub")),
        "vec_id", "__sub", 8, 2)
    }.toArray
    local.zip(dist).zipWithIndex.foreach { case ((l, d), s) =>
      assertSame(l, d, s"subspace $s")
    }
  }
}
