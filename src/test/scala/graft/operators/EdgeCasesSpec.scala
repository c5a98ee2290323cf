package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.SparkSpec

/** Degenerate-input hardening: every operator must return an EMPTY (or
  * correctly tiny) result on empty/trivial corpora, never throw — the
  * edges a library user hits first (fresh tables, single documents,
  * empty text) and the ones a 100 TB run hits at stray partitions.
  */
class EdgeCasesSpec extends SparkSpec {

  private def emptyDocs = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  private def docsOf(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def emptyEmb = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  test("dedup operators are empty-safe") {
    assert(Dedup.exact(emptyDocs, Seq("text"), "doc_id").count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minhashLshCandidates(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs63Collapsed(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.embeddingCosinePairs(emptyEmb, "vec_id", "embedding", 0.4).count() == 0)
    assert(Dedup.embeddingCosinePairsBlocked(emptyEmb, "vec_id", "embedding", 0.4).count() == 0)
    val emptyPairs = docsOf().select(col("doc_id").as("da"), col("doc_id").as("db"))
    assert(Dedup.connectedComponents(emptyPairs, "da", "db").count() == 0)
  }

  test("similarity operators are empty-safe") {
    assert(Similarity.bruteForceTopK(emptyEmb, emptyEmb, "vec_id", "embedding", 5).count() == 0)
    assert(Similarity.lshTopK(emptyEmb, "vec_id", "embedding", 5).count() == 0)
    assert(Similarity.ivfTopK(emptyEmb, "vec_id", "embedding", 5, nList = 4).count() == 0)
    // recall over empty rankings: no probes, no rows, no division
    val noPairs = docsOf().select(col("doc_id").as("qid"), col("doc_id").as("nid"))
    assert(Similarity.recallAtK(noPairs, noPairs).count() == 0)
  }

  test("bigram LM scoring is empty-, null- and short-text-safe") {
    assert(QualityRules.bigramLmScore(emptyDocs, "doc_id", "text").count() == 0)
    // null text and sub-2-token docs yield no bigrams → absent, no throw
    val mixed = docsOf((1L, null), (2L, "one"), (3L, ""), (4L, "two words"))
    val out = QualityRules.bigramLmScore(mixed, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(4L))
    // frozen-model path: empty model scores everything 0, never errors
    val model = QualityRules.bigramLm(emptyDocs, "text")
    val scored = QualityRules.bigramLmScoreAgainst(
      model, docsOf((7L, "a b c")), "doc_id", "text").collect()
    assert(scored.length == 1 && scored.head.getLong(2) == 0L)
  }

  test("semantic and incremental dedup are empty- and tiny-input-safe") {
    // empty corpus: an empty labeled frame, no crash in the quantizer
    assert(Dedup.semanticDedup(emptyEmb, "vec_id", "embedding", nList = 4).count() == 0)
    assert(Dedup.dedupBySemantic(emptyEmb, "vec_id", "embedding", nList = 4).count() == 0)
    // corpus smaller than nList: fewer centroids than requested, every
    // row still labeled and kept as its own singleton
    val s = spark; import s.implicits._
    val two = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(two, "vec_id", "embedding", nList = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == 2 && out.forall(r => r._3 && r._1 == r._2))
    // incremental: empty incoming, empty corpus — both directions safe
    assert(Dedup.minhashLshCandidatesAgainst(emptyDocs,
      docsOf((1L, "a b c d e")), "doc_id", "text").count() == 0)
    assert(Dedup.minhashLshCandidatesAgainst(docsOf((1L, "a b c d e")),
      emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.dedupIncomingByMinhash(docsOf((1L, "a b c d e")),
      emptyDocs, "doc_id", "text").count() == 1)
    assert(Dedup.ngramContainmentPairs(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("single-document and empty-text corpora produce no pairs, no crashes") {
    val single = docsOf((1L, "a b c d e f"))
    assert(Dedup.ngramJaccardPairs(single, "doc_id", "text").count() == 0)
    assert(Dedup.minhashLshCandidates(single, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs(single, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs63Collapsed(single, "doc_id", "text").count() == 0)
    // empty text + a real doc: the empty doc has no shingles, so it can
    // never pair; nothing throws on null minhash signatures
    val mixed = docsOf((1L, ""), (2L, "w1 w2 w3 w4"), (3L, "w1 w2 w3 w4"))
    val pairs = Dedup.minhashLshCandidates(mixed, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 3L)))
    val jac = Dedup.ngramJaccardPairs(mixed, "doc_id", "text")
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac == Set((2L, 3L)))
  }

  test("top terms and sampling are empty-safe") {
    assert(TopTerms.topTermsPerDoc(emptyDocs, "doc_id", "text").count() == 0)
    assert(Sampling.splitByHash(emptyDocs, "doc_id",
      Seq("train" -> 90, "test" -> 10), seed = 1).count() == 0)
    assert(Sampling.samplePerGroup(emptyDocs.withColumn("g", lit("x")),
      "g", "doc_id", 5).count() == 0)
  }

  test("mixture, interleave, and BPE counting are empty-safe") {
    val empty = emptyDocs
      .withColumn("source", lit("s"))
      .withColumn("n_tokens", lit(1L))
    assert(Sampling.mixtureByTokenBudget(empty, "source", "doc_id", "n_tokens",
      _ => lit(10L)).count() == 0)
    assert(Sampling.interleaveByWeight(empty, "source", "doc_id", "n_tokens",
      _ => lit(1L)).count() == 0)
    assert(emptyDocs.select(graft.functions.Bpe.tokenCount(col("text"))).count() == 0)
  }

  test("interleave weight 0 fails loudly (ANSI divide-by-zero), never a silent order") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1L, 5L), ("b", 2L, 5L)).toDF("source", "doc_id", "n_tokens")
    val ex = intercept[Exception] {
      Sampling.interleaveByWeight(df, "source", "doc_id", "n_tokens",
        src => when(src === "a", lit(0L)).otherwise(lit(1L))).collect()
    }
    // a zero weight is a caller error; ANSI DIV surfaces it as an
    // arithmetic failure (DuckDB's // errors identically) instead of
    // quietly producing an unintended schedule
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(_.getMessage.contains("DIVIDE_BY_ZERO")), ex.toString)
  }

  test("ivf top-k on a corpus smaller than nList still answers") {
    val s = spark; import s.implicits._
    val tiny = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val res = Similarity.ivfTopK(tiny, "vec_id", "embedding", k = 2, nList = 8, nProbe = 8)
      .collect()
    // every vector gets neighbors despite nList > corpus size
    assert(res.map(_.getLong(0)).distinct.length == 3)
  }
}
