package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the codegen kernels: every hash/vector kernel
  * registered as a named SQL function, so `spark.sql("SELECT
  * graft_simhash32(graft_shingles(text, 3)) …")` works without touching
  * the Scala API — the extension route a platform team would ship the
  * library through (`spark.sql.extensions=graft.GraftExtensions`, or
  * `GraftFunctions.register(spark)` on a live session).
  *
  * Size parameters (shingle n, minhash k, LSH planes) must be foldable
  * integer literals — they parameterize the generated code itself.
  */
object GraftFunctions {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case l: Literal if l.foldable => l.value match {
      case i: Int => i
      case l2: Long => l2.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }
    case other if other.foldable => other.eval() match {
      case i: Int => i
      case l2: Long => l2.toInt
      case o => throw new IllegalArgumentException(s"$fn: $arg must fold to an integer, got $o")
    }
    case _ => throw new IllegalArgumentException(s"$fn: $arg must be a literal")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(s"$fn expects $n arguments, got ${args.length}")

  /** name → (builder, usage) for every SQL-exposable kernel. */
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("graft_shingles",
      (args: Seq[Expression]) => { arity("graft_shingles", args, 2)
        ShinglesK(args(0), litInt(args(1), "graft_shingles", "n")) },
      "graft_shingles(text, n) - word n-gram shingles of a string"),
    ("graft_shingle_hashes",
      (args: Seq[Expression]) => { arity("graft_shingle_hashes", args, 2)
        ShingleHashesK(args(0), litInt(args(1), "graft_shingle_hashes", "n")) },
      "graft_shingle_hashes(text, n) - packed 64-bit double hash of each word n-gram shingle"),
    ("graft_simhash32",
      (args: Seq[Expression]) => { arity("graft_simhash32", args, 1)
        SimHash32K(args(0)) },
      "graft_simhash32(shingles) - 32-bit simhash of a string array"),
    ("graft_simhash63",
      (args: Seq[Expression]) => { arity("graft_simhash63", args, 1)
        SimHash63K(args(0)) },
      "graft_simhash63(shingles) - 63-bit simhash (affine-sign bits; the corpus-scale fingerprint)"),
    ("graft_utf8_invalid",
      (args: Seq[Expression]) => { arity("graft_utf8_invalid", args, 1)
        Utf8InvalidK(args(0)) },
      "graft_utf8_invalid(bin) - strict RFC 3629 invalid-byte count (one per rejected sequence start)"),
    ("graft_robots_allowed",
      (args: Seq[Expression]) => { arity("graft_robots_allowed", args, 3)
        RobotsAllowedK(args(0), args(1), args(2)) },
      "graft_robots_allowed(robots_txt, agent, path) - RFC 9309 allow decision (longest match, tie->allow)"),
    ("graft_high_bytes",
      (args: Seq[Expression]) => { arity("graft_high_bytes", args, 1)
        HighBytesK(args(0)) },
      "graft_high_bytes(bin) - count of bytes with the top bit set"),
    ("graft_nul_bytes",
      (args: Seq[Expression]) => { arity("graft_nul_bytes", args, 1)
        NulBytesK(args(0)) },
      "graft_nul_bytes(bin) - count of 0x00 bytes (binary-content signal)"),
    ("graft_minhash_sig",
      (args: Seq[Expression]) => { arity("graft_minhash_sig", args, 2)
        MinHashSigK(args(0), litInt(args(1), "graft_minhash_sig", "k")) },
      "graft_minhash_sig(shingles, k) - k-element minhash signature"),
    ("graft_vec_dot",
      (args: Seq[Expression]) => { arity("graft_vec_dot", args, 2)
        VecDotK(args(0), args(1)) },
      "graft_vec_dot(a, b) - left-to-right double-fold dot of float arrays"),
    ("graft_vec_norm2",
      (args: Seq[Expression]) => { arity("graft_vec_norm2", args, 1)
        VecNorm2K(args(0)) },
      "graft_vec_norm2(a) - squared L2 norm of a float array"),
    ("graft_lsh_sig",
      (args: Seq[Expression]) => { arity("graft_lsh_sig", args, 2)
        LshSigK(args(0), litInt(args(1), "graft_lsh_sig", "planes")) },
      "graft_lsh_sig(vec, planes) - random-hyperplane LSH signature"),
    ("graft_bpe_count",
      (args: Seq[Expression]) => { arity("graft_bpe_count", args, 1)
        BpeCountK(args(0), Bpe.defaultRanks) },
      "graft_bpe_count(text) - BPE subword token count under the shipped merge table"),
    ("graft_bpe_pieces",
      (args: Seq[Expression]) => { arity("graft_bpe_pieces", args, 1)
        BpePiecesK(args(0), Bpe.defaultRanks) },
      "graft_bpe_pieces(text) - BPE subword pieces under the shipped merge table"),
    ("graft_bpe_count_file",
      (args: Seq[Expression]) => { arity("graft_bpe_count_file", args, 2)
        BpeCountK(args(1), ranksFor(litStr(args(0), "graft_bpe_count_file", "path"))) },
      "graft_bpe_count_file(path, text) - BPE token count under the merges.txt at path " +
        "(literal; loaded once per path, so any model's table plugs into SQL)"),
    ("graft_bpe_ids",
      (args: Seq[Expression]) => { arity("graft_bpe_ids", args, 1)
        BpeIdsK(args(0), Bpe.defaultRanks) },
      "graft_bpe_ids(text) - BPE token ids (codepoint | 0x110000+merge-rank) under the shipped table"),
    ("graft_topk",
      (args: Seq[Expression]) => { arity("graft_topk", args, 3)
        TopKPairs(args(0), args(1), args(2)) },
      "graft_topk(ord, id, k) - aggregate: top-k (ord, id) pairs per group by " +
        "(ord DESC, id ASC); k-bounded partial state, map-side combined"))

  private def litStr(e: Expression, fn: String, arg: String): String = e match {
    case other if other.foldable => other.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case o => throw new IllegalArgumentException(s"$fn: $arg must fold to a string, got $o")
    }
    case _ => throw new IllegalArgumentException(s"$fn: $arg must be a literal path")
  }

  /** merge tables load once per path per JVM — the table parameterizes
    * the generated code, so it must be resolved at plan time, and
    * re-reading the file per expression build would hit the driver
    * filesystem on every query compile.
    */
  private val ranksCache = scala.collection.concurrent.TrieMap.empty[String, Bpe.Ranks]
  private def ranksFor(path: String): Bpe.Ranks =
    ranksCache.getOrElseUpdate(path, Bpe.loadFile(path))

  /** Register every kernel on a LIVE session (temp functions). */
  def register(spark: SparkSession): Unit = all.foreach { case (name, builder, _) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
  }

  /** Inject every kernel through the extensions API (built sessions). */
  def inject(ext: SparkSessionExtensions): Unit = all.foreach { case (name, builder, usage) =>
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[Kernels.type].getName, null, name, usage, ""),
      builder))
  }
}
