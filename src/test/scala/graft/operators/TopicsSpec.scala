package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Feature-hashed topic clustering: exact bag-of-words semantics,
  * deterministic labels, and the balanced-sample composition staying
  * on the k-bounded aggregate.
  */
class TopicsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("feature vectors are 64-dim, integer-valued, and word-order invariant") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "gamma alpha alpha beta"), // same bag, different order
      (3L, "wholly different words here")).toDF("doc_id", "text")
    val fv = Topics.featureHashVectors(df, "doc_id", "text", dim = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(fv(1L).length == 64)
    assert(fv(1L).forall(x => x == math.rint(x)), "feature sums must be integers")
    assert(fv(1L) == fv(2L), "bag-of-words: word order must not matter")
    assert(fv(1L) != fv(3L), "different bags must differ")
    // the vector's absolute mass equals at most the word count (each
    // word contributes exactly one +-1)
    assert(fv(1L).map(x => math.abs(x)).sum <= 4.0f)
  }

  test("feature build is a zero-shuffle row-local projection; frozen-model assign streams") {
    val p = Topics.featureHashVectors(docs, "doc_id", "text", dim = 64)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"feature build must not shuffle:\n$p")
    // frozen-model assignment is a pure projection -> streaming-safe
    val fv = Topics.featureHashVectors(docs, "doc_id", "text", dim = 64)
    val model = Similarity.ivfCentroids(fv, "id", "fvec", nList = 8, iters = 2)
    val ap = Topics.assignTopics(docs, model, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!ap.contains("Exchange"), s"assignment must not shuffle:\n$ap")
    // and actually runs as a stream (rate-limited one-batch drive)
    val dir = java.nio.file.Files.createTempDirectory("graft-topics-stream").toString
    docs.limit(50).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$dir/in")
    val q = Topics.assignTopics(stream, model, "doc_id", "text")
      .writeStream.format("memory").queryName("topics_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("topics_stream")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val batch = Topics.assignTopics(docs.limit(50), model, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(streamed == batch, "stream assign must equal batch assign")
  }

  test("topic labels cover every doc, stay in range, and are deterministic") {
    val a = Topics.topicClusters(docs, "doc_id", "text", nTopics = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a.length == docs.count(), "every doc labeled")
    assert(a.forall(t => t._2 >= 0 && t._2 < 8))
    assert(a.map(_._2).distinct.length > 1, "degenerate single-topic clustering")
    val b = Topics.topicClusters(docs, "doc_id", "text", nTopics = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a.toSet == b.toSet, "labels must be deterministic")
  }

  test("topic-balanced sample caps every topic at k via the aggregate, not a window") {
    val out = Topics.topicBalancedSample(docs, "doc_id", "text",
      graft.functions.TextFunctions.qualityScorePpm(col("text")), k = 15)
    out.collect()
    val perTopic = out.groupBy("topic").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1))
    assert(perTopic.forall(_ <= 15))
    assert(perTopic.exists(_ == 15), "cap must bind on at least one topic")
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_topk"), s"no map-side partial top-k:\n$p")
  }
}
