package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Top distinctive terms per document (TF-IDF-shaped, float-free).
  *
  * score = tf·10⁶ DIV df is pure integer arithmetic, so the ranking is
  * bit-identical across engines — no log() ulp differences can flip a
  * rank boundary.
  */
object TopTerms {

  /** Per-document top-`topK` terms by tf·10⁶ DIV df.
    *
    * Scale shape: `tf` is corpus-sized and already partitioned by
    * (doc, term); the doc-frequency side is vocabulary-sized. Joining
    * them broadcast keeps tf where it is; joining them shuffled re-keys
    * the corpus on term. Which is right depends on the vocabulary:
    *
    *  - `minDf` prunes the long tail (df < minDf) BEFORE the join —
    *    typical corpora lose most of their vocabulary rows here
    *  - `broadcastVocabMax` decides the join side: `Long.MaxValue`
    *    forces the broadcast hint and `<= 0` forces the AQE/shuffle
    *    path, both WITHOUT any measurement job (the caller already
    *    knows); any finite positive threshold is adaptive — the pruned
    *    vocabulary is counted (a vocabulary-cardinality aggregate) and
    *    broadcast only while it fits. The adaptive count costs one
    *    extra tf pass, the right trade at scale against persisting the
    *    corpus-sized tf intermediate.
    *
    * In adaptive mode the vocab frame is persisted so the count and
    * the join share one computation; it is vocabulary-sized (bounded,
    * pruned) and ages out of the block store by LRU after the query.
    *
    * Note: `minDf > 1` removes pruned terms from scoring entirely
    * (they can no longer appear in any document's top-k).
    */
  def topTermsPerDoc(docs: DataFrame, idCol: String, textCol: String,
                     topK: Int = 3, minDf: Long = 1L,
                     broadcastVocabMax: Long = 10000000L): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
    val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val vocab =
      if (broadcastVocabMax == Long.MaxValue) broadcast(dfreq)
      else if (broadcastVocabMax <= 0L) dfreq
      else {
        val d = dfreq.persist(StorageLevel.MEMORY_AND_DISK)
        if (d.count() <= broadcastVocabMax) broadcast(d) else d
      }
    val scored = tf.join(vocab, "w")
      .withColumn("score", expr("(tf * 1000000) DIV df"))
    val rk = Window.partitionBy("doc_id").orderBy(col("score").desc, col("w").asc)
    scored.withColumn("rank", row_number().over(rk).cast("long")).filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("w").as("term"),
        col("tf"), col("df"), col("score"))
  }
}
