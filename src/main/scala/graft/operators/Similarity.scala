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

  /** left-to-right double-fold dot product (engine-reproducible),
    * computed by the codegen kernel [[graft.functions.Kernels]]. */
  def dot(a: Column, b: Column): Column = graft.functions.Kernels.vecDot(a, b)

  def norm2(a: Column): Column = graft.functions.Kernels.vecNorm2(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Exact top-k: for each query vector, the k nearest corpus vectors
    * by cosine (descending, id tie-break). Query side is broadcast.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms are computed once per side before the pair join, not per pair
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      norm2(col(vecCol)).as("qnrm")))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      norm2(col(vecCol)).as("nnrm"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qvec"), col("nvec")) / sqrt(col("qnrm") * col("nnrm"))).as("cos"))
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
    graft.functions.Kernels.lshSig(vec, planes)

  /** Candidate pairs whose signatures agree on at least one of the
    * `tables` bucket views (each view masks a disjoint group of planes).
    */
  def lshCandidates(df: DataFrame, idCol: String, vecCol: String,
                    planes: Int = 16, tables: Int = 4): DataFrame = {
    val perTable = planes / tables
    // bucket join and pair-dedup carry only ids — vectors (the wide
    // payload) are joined back afterwards on id, a co-partitioned hash
    // join at scale and an AQE broadcast at bench size
    val sig = df.select(col(idCol).as("id"), lshSignature(col(vecCol), planes).as("sig"))
    val bucketed = sig.select(col("id"),
      explode(array((0 until tables).map { t =>
        val mask = ((1L << perTable) - 1) << (t * perTable)
        struct(lit(t).as("t"), (col("sig").bitwiseAND(lit(mask))).as("v"))
      }: _*)).as("bucket"))
    val pairs = bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"))
      .distinct()
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    pairs
      .join(v.as("va"), col("ida") === col("va.id"))
      .join(v.as("vb"), col("idb") === col("vb.id"))
      .select(col("ida"), col("va.vec").as("veca"), col("idb"), col("vb.vec").as("vecb"))
  }

  /** ANN top-k via LSH buckets + exact re-rank of candidates. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              k: Int, planes: Int = 16, tables: Int = 4): DataFrame = {
    // score each candidate pair once, then mirror it for both directions
    val scored = lshCandidates(df, idCol, vecCol, planes, tables)
      .withColumn("cos", cosine(col("veca"), col("vecb")))
    val sym = scored.select(col("ida").as("qid"), col("idb").as("nid"), col("cos"))
      .union(scored.select(col("idb").as("qid"), col("ida").as("nid"), col("cos")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    sym.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("qid", "rank", "nid")
  }
}
