package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse TF-IDF cosine similarity over raw text — the lexical
  * neighbor to the embedding-space operators in [[Similarity]]: finds
  * document pairs whose *term-weight* vectors are close, without any
  * embedding model in the loop.
  *
  * Same inverted-index discipline as [[Dedup.ngramJaccardPairs]]: pairs
  * are generated per posting list (documents sharing a term), never
  * from the O(n²) pair space, and a term-frequency cap bounds every
  * posting list so a stopword-grade hot term cannot produce a
  * quadratic reducer at 100 TB.
  *
  * All scoring is integer: weight = tf·1000 DIV df (the integer-scaled
  * TF-IDF used by the top-terms operator), dot products and norms are
  * int64 sums, and the cosine threshold num/√(na·nb) ≥ tNum/tDen is
  * evaluated as tDen²·num² ≥ tNum²·na·nb in decimal — no float ever
  * enters, so pair membership is bit-identical on any engine.
  */
object TextSim {

  /** Document pairs with integer TF-IDF cosine ≥ tNum/tDen.
    *
    * Output: `da`, `db`, `num` (weighted dot), `na`, `nb` (squared
    * norms). Plan: four key-partitioned shuffles — (doc,term) tf,
    * term posting lists, doc norms, pair accumulation — each with
    * map-side partial aggregation.
    */
  def tfidfCosinePairs(
      df: DataFrame, idCol: String, textCol: String,
      tNum: Int = 1, tDen: Int = 2,
      maxTermDocs: Long = 1000L): DataFrame = {
    require(tNum >= 0 && tDen > 0, "threshold must be a non-negative ratio")
    val tf = df
      .select(col(idCol).as("doc"),
        explode(filter(split(col(textCol), " "), w => w =!= "")).as("w"))
      .groupBy("doc", "w").agg(count(lit(1)).as("tf"))
    // posting list per term; df = list size, so the weight is computed
    // inside the same projection (floor of a small-integer ratio is
    // exact in double — cannot sit within one ulp of an integer)
    val inv = tf.groupBy("w")
      .agg(collect_list(struct(col("doc"), col("tf"))).as("ps"))
      .filter(size(col("ps")) <= maxTermDocs)
      .select(transform(col("ps"), p =>
        struct(p("doc").as("doc"),
          floor((p("tf") * 1000L) / size(col("ps"))).cast("long").as("wt"))).as("ps"))
    val entries = inv.select(explode(col("ps")).as("e"))
      .select(col("e.doc").as("doc"), col("e.wt").as("wt"))
    val norms = entries.groupBy("doc").agg(sum(col("wt") * col("wt")).as("nrm"))
    // ordered pairs per posting list: the product terms accumulate into
    // the pair's weighted dot in one aggregation
    val pairs = inv
      .select(explode(col("ps")).as("a"), col("ps"))
      .select(col("a.doc").as("da"), col("a.wt").as("wa"), explode(col("ps")).as("b"))
      .where(col("da") < col("b.doc"))
      .select(col("da"), col("b.doc").as("db"), (col("wa") * col("b.wt")).as("prod"))
      .groupBy("da", "db").agg(sum("prod").as("num"))
    // exact BigInteger cross-multiplication (Kernels.cosineGteEval): a
    // decimal(15,0) formulation would silently null-and-drop any pair
    // whose operand passes ~1e15 (possible: wt is unbounded by doc
    // length for rare terms). The int64 sums feeding it are the only
    // remaining bound — overflow needs a single posting-list dot or
    // norm ≥ 2^63, i.e. ~10⁹-token documents at max weight.
    pairs
      .join(norms.as("sa"), col("da") === col("sa.doc"))
      .join(norms.as("sb"), col("db") === col("sb.doc"))
      .select(col("da"), col("db"), col("num"),
        col("sa.nrm").as("na"), col("sb.nrm").as("nb"))
      .filter(graft.functions.Kernels.cosineGte(col("num"), col("na"), col("nb"), tNum, tDen))
  }
}
