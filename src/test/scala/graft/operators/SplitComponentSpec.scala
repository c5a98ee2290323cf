package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Leakage-safe splitting: components never straddle splits, unpaired
  * rows keep their plain hash-split assignment, fractions hold.
  */
class SplitComponentSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  private def pairs = Dedup.minhashLshCandidates(
    docs, "doc_id", "text", n = 3, k = 8, bands = 2)

  private val fr = Seq("train" -> 80, "valid" -> 10, "test" -> 10)

  test("no near-dup pair straddles a split boundary") {
    val split = Sampling.splitByComponent(docs, "doc_id", pairs, "da", "db", fr, seed = 1)
      .select(col("doc_id"), col("split"))
    val leaked = pairs
      .join(split.as("sa"), col("da") === col("sa.doc_id"))
      .join(split.as("sb"), col("db") === col("sb.doc_id"))
      .filter(col("sa.split") =!= col("sb.split"))
    assert(leaked.count() == 0, "a candidate pair was split across train/test")
    // and splitByHash alone DOES leak on this corpus — the reason the
    // operator exists (if this ever stops holding, the corpus no
    // longer exercises the leakage case)
    val naive = Sampling.splitByHash(docs, "doc_id", fr, seed = 1)
      .select(col("doc_id"), col("split"))
    val naiveLeaked = pairs
      .join(naive.as("sa"), col("da") === col("sa.doc_id"))
      .join(naive.as("sb"), col("db") === col("sb.doc_id"))
      .filter(col("sa.split") =!= col("sb.split"))
    assert(naiveLeaked.count() > 0)
  }

  test("unpaired docs keep their splitByHash assignment") {
    val pairedIds = pairs.select(col("da").as("id"))
      .union(pairs.select(col("db"))).distinct()
    val comp = Sampling.splitByComponent(docs, "doc_id", pairs, "da", "db", fr, seed = 1)
      .select(col("doc_id"), col("split").as("comp_split"))
    val plain = Sampling.splitByHash(docs, "doc_id", fr, seed = 1)
      .select(col("doc_id"), col("split").as("plain_split"))
    val diff = comp.join(plain, "doc_id")
      .join(pairedIds, col("doc_id") === col("id"), "left_anti")
      .filter(col("comp_split") =!= col("plain_split"))
    assert(diff.count() == 0)
  }

  test("output is row-preserving and fractions are roughly honored") {
    val out = Sampling.splitByComponent(docs, "doc_id", pairs, "da", "db", fr, seed = 1)
    assert(out.count() == docs.count())
    val bys = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    // components move in blocks, so tolerances are loose
    assert(bys("train") / n > 0.6 && bys("train") / n < 0.95, bys.toString)
    assert(bys.values.sum == n)
  }
}
