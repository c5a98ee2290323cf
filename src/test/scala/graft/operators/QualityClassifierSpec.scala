package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Trained quality classifier: integer fixed-point GD semantics, real
  * accuracy against the weak-label target, frozen-weight serving, and
  * the zero-shuffle scoring plan.
  */
class QualityClassifierSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def label = TextFunctions.qualityScorePpm(col("text")) >= 500000

  test("training learns the weak-label signal well beyond the base rate") {
    val scored = QualityClassifier.classify(docs, "doc_id", "text", label)
      .join(docs.select(col("doc_id"), label.cast("int").as("y")), "doc_id")
    val (n, correct, pos) = {
      val r = scored.agg(
        count(lit(1)), sum(when(col("pred") === col("y"), 1).otherwise(0)), sum("y")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val acc = correct.toDouble / n
    val baseRate = math.max(pos, n - pos).toDouble / n
    assert(acc > 0.90, s"train accuracy $acc too low (n=$n)")
    assert(acc > baseRate + 0.05, s"accuracy $acc does not beat always-majority $baseRate")
  }

  test("frozen weights generalize to held-out docs (serving path)") {
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val test = docs.filter(col("doc_id") % 10 === 0)
    val w = QualityClassifier.trainWeights(train, "doc_id", "text", label)
    assert(w.length == 257 && w.exists(_ != 0L), "expected trained 256+bias weights")
    val scored = QualityClassifier.scoreAgainst(w, test, "doc_id", "text")
      .join(test.select(col("doc_id"), label.cast("int").as("y")), "doc_id")
    val r = scored.agg(count(lit(1)),
      sum(when(col("pred") === col("y"), 1).otherwise(0))).head()
    val acc = r.getLong(1).toDouble / r.getLong(0)
    assert(acc > 0.70, s"holdout accuracy $acc too low")
  }

  test("outputs are exact fixed-point: prob_ppm/pred derive from margin") {
    val w = QualityClassifier.trainWeights(docs, "doc_id", "text", label, iters = 2)
    val rows = QualityClassifier.scoreAgainst(w, docs.limit(50), "doc_id", "text").collect()
    val S = QualityClassifier.Scale
    rows.foreach { r =>
      val z = r.getLong(1); val ppm = r.getLong(2); val pred = r.getInt(3)
      val u4 = math.min(math.max(2 * S + z, 0L), 4 * S)
      assert(ppm == u4 * 1000000L / (4 * S), s"prob_ppm mismatch at z=$z")
      assert(pred == (if (z > 0) 1 else 0))
      assert(ppm >= 0 && ppm <= 1000000)
    }
  }

  test("scoring against frozen weights plans zero shuffles (streaming-composable)") {
    val w = QualityClassifier.trainWeights(docs, "doc_id", "text", label, iters = 1)
    val plan = QualityClassifier.scoreAgainst(w, docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frozen-model scoring must be map-only:\n$plan")
    // keep-columns pass-through stays a pure projection (the shape
    // ta_quality_clf_stateful routes on) — no join back for the key
    val kept = QualityClassifier.scoreAgainst(w, docs, "doc_id", "text",
      keep = Seq("source"))
    assert(kept.columns.toSeq == Seq("doc_id", "source", "margin", "prob_ppm", "pred"))
    val kp = kept.queryExecution.executedPlan.toString
    assert(!kp.contains("Exchange"), s"keep-cols scoring must stay map-only:\n$kp")
  }

  test("frozen-model scoring drops into readStream unchanged (stream equals batch)") {
    val w = QualityClassifier.trainWeights(docs, "doc_id", "text", label, iters = 2)
    val in = docs.select("doc_id", "text").limit(60)
    val dir = java.nio.file.Files.createTempDirectory("graft-clf-stream").toString
    in.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(in.schema).parquet(s"$dir/in")
    val q = QualityClassifier.scoreAgainst(w, stream, "doc_id", "text")
      .writeStream.format("memory").queryName("clf_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("clf_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val batch = QualityClassifier.scoreAgainst(w, in, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(streamed == batch, "stream scoring must equal batch scoring")
    assert(streamed.nonEmpty)
  }

  test("deterministic: two trainings produce identical weights") {
    val w1 = QualityClassifier.trainWeights(docs, "doc_id", "text", label, iters = 3)
    val w2 = QualityClassifier.trainWeights(docs, "doc_id", "text", label, iters = 3)
    assert(w1.toSeq == w2.toSeq)
  }

  test("null text rows are dropped; empty corpus trains zero weights") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, null: String), (2L, "a b c")).toDF("doc_id", "text")
    assert(QualityClassifier.classify(d, "doc_id", "text", label, iters = 1).count() == 1)
    val none = d.filter(lit(false))
    assert(QualityClassifier.trainWeights(none, "doc_id", "text", label).forall(_ == 0L))
  }

  test("local GD trainer == distributed gradient-aggregation trainer, bit for bit") {
    val docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for ((dim, iters) <- Seq((256, 12), (64, 3))) {
      val local = QualityClassifier.trainWeights(docs01, "doc_id", "text", label, dim, iters)
      val dist = QualityClassifier.trainWeightsDistributed(docs01, "doc_id", "text", label, dim, iters)
      assert(local.toSeq == dist.toSeq, s"weights diverge at dim=$dim iters=$iters")
    }
    // capped sample binds: both paths must agree on WHICH rows train
    val localCap = QualityClassifier.trainWeights(docs01, "doc_id", "text", label, 64, 3, maxTrainDocs = 37)
    val distCap = QualityClassifier.trainWeightsDistributed(docs01, "doc_id", "text", label, 64, 3, maxTrainDocs = 37)
    assert(localCap.toSeq == distCap.toSeq, "capped-sample weights diverge")
  }
}
