package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 lexical top-k: exact integer scoring vs an independent Scala
  * brute force, probe self-retrieval, the df cap's stopword shedding,
  * and the no-window selection plan.
  */
class Bm25Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  /** Independent reimplementation of the integer BM25: plain Scala
    * maps, no Spark — the reference the operator must match exactly.
    */
  private def bruteForce(
      corpus: Seq[(Long, String)], queries: Seq[(Long, String)],
      k: Int, maxTermDocs: Long): Seq[(Long, Long, Long, Long)] = {
    val toks = (t: String) => t.split(" ").filter(_.nonEmpty).toSeq
    val tf: Map[(Long, String), Long] = corpus
      .flatMap { case (id, t) => toks(t).map(w => (id, w)) }
      .groupBy(identity).map { case (kk, v) => kk -> v.size.toLong }
    val dl: Map[Long, Long] =
      tf.groupBy(_._1._1).map { case (id, m) => id -> m.values.sum }
    val n = dl.size.toLong
    val avgdl = dl.values.sum / n
    val df: Map[String, Long] = tf.keys.toSeq.groupBy(_._2)
      .map { case (w, ks) => w -> ks.size.toLong }
      .filter(_._2 <= maxTermDocs)
    queries.flatMap { case (qid, qt) =>
      val terms = toks(qt).distinct
      val scores = dl.keys.toSeq.flatMap { d =>
        val s = terms.flatMap { w =>
          for (fq <- df.get(w); t <- tf.get((d, w))) yield {
            val idf = ((n - fq) * 2 + 1) * 1000 / (fq * 2 + 1)
            idf * t * 22 * avgdl / (10 * avgdl * t + 3 * avgdl + 9 * dl(d))
          }
        }.sum
        if (s > 0) Some((d, s)) else None
      }
      scores.sortBy { case (d, s) => (-s, d) }.take(k).zipWithIndex
        .map { case ((d, s), i) => (qid, (i + 1).toLong, d, s) }
    }
  }

  test("bm25TopK matches the independent integer brute force exactly") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark shuffles data across the cluster"),
      (2L, "spark spark spark broadcast joins avoid the shuffle"),
      (3L, "ducks swim in the pond"),
      (4L, "the pond holds many many ducks and one swan"),
      (5L, "broadcast towers transmit radio"),
      (6L, ""))
    val queries = Seq((100L, "spark shuffle broadcast"), (200L, "ducks pond"))
    val out = TextSim.bm25TopK(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        queries.toDF("doc_id", "text"), "doc_id", "text",
        k = 3, maxTermDocs = 100L)
      .orderBy("qid", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val exp = bruteForce(corpus, queries, k = 3, maxTermDocs = 100L)
    assert(out == exp)
  }

  test("df cap sheds stopword-grade terms: a hot-term-only query retrieves nothing") {
    import spark.implicits._
    // 'the' appears in 3 docs; cap 2 drops it, so the query loses its
    // only term and emits zero rows rather than ranking on boilerplate
    val corpus = Seq(
      (1L, "the quick fox"), (2L, "the slow snail"), (3L, "the tall tree"),
      (4L, "quiet mountain"))
    val out = TextSim.bm25TopK(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      Seq((9L, "the")).toDF("doc_id", "text"), "doc_id", "text",
      k = 5, maxTermDocs = 2L)
    assert(out.count() == 0)
    // and the surviving-term path still ranks
    val out2 = TextSim.bm25TopK(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      Seq((9L, "the fox")).toDF("doc_id", "text"), "doc_id", "text",
      k = 5, maxTermDocs = 2L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out2 == Seq((1L, 1L))) // only doc 1 has 'fox'; 'the' is shed
  }

  test("distinct-vocabulary probes retrieve themselves first") {
    import spark.implicits._
    // self-at-rank-1 needs distinctive vocabulary — on the near-dup
    // testdata corpus (doc 82 = doc 0 + a repeated token) BM25
    // legitimately ranks the tf-boosted near-dup above the probe, so
    // the property is pinned on a corpus where each doc owns a term
    val corpus = (1L to 20L).map(i =>
      (i, s"shared words here unique$i unique$i marker$i"))
    val out = TextSim.bm25TopK(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        corpus.take(5).toDF("doc_id", "text"), "doc_id", "text",
        k = 3, maxTermDocs = 100L)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.length == 5 && out.forall { case (q, n) => q == n })
  }

  test("corpus ranks are dense from 1 and scores non-increasing per probe") {
    val probes = docs.filter(col("doc_id") % 100 === 0)
    val out = TextSim.bm25TopK(docs, "doc_id", "text",
        probes, "doc_id", "text", k = 10, maxTermDocs = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq, s"ranks not dense for $q")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 > b._4 || (a._4 == b._4 && a._3 < b._3); case _ => true
      }, s"order violates (score DESC, id ASC) for $q")
    }
  }

  test("a persisted index answers identically to the direct path") {
    // the serving-tier shape: build once, write the postings+stats to
    // parquet, reload cold, query — bit-identical ranking
    val probes = docs.filter(col("doc_id") % 100 === 0)
    val direct = TextSim.bm25TopK(docs, "doc_id", "text",
        probes, "doc_id", "text", k = 5, maxTermDocs = 1000L)
      .collect().map(_.toSeq).toSet
    val idx = TextSim.bm25Index(docs, "doc_id", "text", maxTermDocs = 1000L)
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    idx.postings.write.mode("overwrite").parquet(s"$dir/postings")
    idx.stats.write.mode("overwrite").parquet(s"$dir/stats")
    val reloaded = TextSim.Bm25Index(
      spark.read.parquet(s"$dir/postings"), spark.read.parquet(s"$dir/stats"))
    val served = TextSim.bm25TopKAgainst(reloaded, probes, "doc_id", "text", k = 5)
      .collect().map(_.toSeq).toSet
    assert(served == direct)
  }

  test("selection is the k-bounded aggregate and probes broadcast — no window, no cartesian") {
    val probes = docs.filter(col("doc_id") % 100 === 0)
    val df = TextSim.bm25TopK(docs, "doc_id", "text",
      probes, "doc_id", "text", k = 10, maxTermDocs = 1000L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_topk"), s"no map-side partial top-k:\n$p")
    assert(!p.contains("Window"), s"per-query window selection:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in scoring:\n$p")
  }
}
