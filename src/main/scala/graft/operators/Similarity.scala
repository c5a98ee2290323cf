package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query
  *    set against the corpus, rank per query. Corpus is scanned once,
  *    never shuffled by pair.
  *  - [[lshTopK]]: scale path — random-hyperplane signatures bucket the
  *    corpus (one shuffle), candidates re-ranked exactly. Hyperplane
  *    weights are ±1 derived from a deterministic integer hash, so the
  *    index is reproducible job-to-job (re-runs see the same buckets).
  */
object Similarity {

  /** left-to-right double-fold dot product (engine-reproducible). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Exact top-k: for each query vector, the k nearest corpus vectors
    * by cosine (descending, id tie-break). Query side is broadcast.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("qid", "rank", "nid")
  }

  /** deterministic ±1 hyperplane weight for (plane p, dim d). */
  private def planeSign(p: Int, d: Column): Column = {
    val x = (lit(1103515245L * p + 12345L) * (d + 1) + lit(2654435761L)) % lit(2147483647L)
    when(pmod(x, lit(2L)) === 0, lit(1.0)).otherwise(lit(-1.0))
  }

  /** sign-signature of a vector under `planes` hyperplanes (bit p set
    * iff Σ_d sign(p,d)·v_d > 0).
    */
  def lshSignature(vec: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val s = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, d) =>
          x.cast("double") * planeSign(p, d)),
        lit(0.0), (acc, x) => acc + x)
      when(s > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Candidate pairs whose signatures agree on at least one of the
    * `tables` bucket views (each view masks a disjoint group of planes).
    */
  def lshCandidates(df: DataFrame, idCol: String, vecCol: String,
                    planes: Int = 16, tables: Int = 4): DataFrame = {
    val perTable = planes / tables
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      lshSignature(col(vecCol), planes).as("sig"))
    val bucketed = sig.select(col("id"), col("vec"),
      explode(array((0 until tables).map { t =>
        val mask = ((1L << perTable) - 1) << (t * perTable)
        struct(lit(t).as("t"), (col("sig").bitwiseAND(lit(mask))).as("v"))
      }: _*)).as("bucket"))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("a.vec").as("veca"),
        col("b.id").as("idb"), col("b.vec").as("vecb"))
      .distinct()
  }

  /** ANN top-k via LSH buckets + exact re-rank of candidates. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              k: Int, planes: Int = 16, tables: Int = 4): DataFrame = {
    val cand = lshCandidates(df, idCol, vecCol, planes, tables)
    val sym = cand.select(col("ida").as("qid"), col("idb").as("nid"),
        cosine(col("veca"), col("vecb")).as("cos"))
      .union(cand.select(col("idb").as("qid"), col("ida").as("nid"),
        cosine(col("veca"), col("vecb")).as("cos")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    sym.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("qid", "rank", "nid")
  }
}
