package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core-count scaling probe at a LARGER-THAN-BENCH scale factor
  * (VERDICT r16 #8): at sf0.1 every query is sub-2 s and
  * action-latency-bound, so 8-core and 32-core runs measure the same
  * driver overhead and "parallel scaling" is unmeasurable either way.
  * This tool synthesizes a ~Rx corpus from the bench SF with ORGANIC
  * growth (per-replica word salting for documents — constant dup rate,
  * not verbatim duplication that would blow the pair operators
  * quadratically in R; id offsets keep keys unique and joins
  * consistent across tables), then times a query list warm at the
  * current SPARK_GRAFT_CPUS. Run it twice (CPUS=32, CPUS=8) and
  * compare: data-bound queries should approach the core ratio,
  * latency-floor queries stay ≈1.
  *
  * `runMain graft.CoreScaling <srcSfDir> <outDir> <replicas> [q1 q2 ...]`
  * Generation is deterministic and runs only when <outDir> is missing.
  * A measurement tool — not part of the driver contract.
  */
object CoreScaling {
  private val DefaultQueries = Seq(
    "dd_ngram_jaccard", "dd_containment", "dd_simhash64", "ta_bm25",
    "ta_bm25_wide", "dd_semdedup", "ann_int8_topk", "ann_lsh_bucketed",
    "ta_tfidf_cosine", "dd_drop_repeated", "ta_fuzzy_match",
    "dd_cdc_dedup", "q6_filter_pushdown", "q19_session_window",
    "ta_lm_score", "dd_dedup_apply")

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: CoreScaling <srcSfDir> <outDir> <replicas> [queries...]")
    val Array(src, out, repStr) = args.take(3)
    val replicas = repStr.toInt
    val queries = if (args.length > 3) args.drop(3).toSeq else DefaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(out))) {
      println(s"[corescaling] generating ${replicas}x corpus at $out")
      def reps(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
        (0 until replicas).map(k => f(df, k)).reduce(_ unionByName _)
      def write(name: String, df: DataFrame): Unit =
        df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      val docs = spark.read.parquet(s"$src/documents.parquet")
      write("documents", reps(docs) { (d, k) =>
        if (k == 0) d
        else d.select(
          (col("doc_id") + k * 10000000L).as("doc_id"),
          // per-replica word salt: replica vocabularies are disjoint,
          // so shingle/band/bucket collisions stay at the organic rate
          array_join(transform(split(col("text"), " "),
            w => when(w === "", w).otherwise(concat(w, lit("y" + k)))), " ").as("text"),
          col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")))
      })
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      write("embeddings", reps(emb) { (e, k) =>
        if (k == 0) e
        else e.select(
          (col("vec_id") + k * 10000000L).as("vec_id"),
          // small deterministic per-replica rotation keeps near-dup
          // structure without byte-identical clusters
          transform(col("embedding"), x => x + lit(k.toFloat * 0.001f)).as("embedding"),
          col("label"))
      })
      val events = spark.read.parquet(s"$src/events.parquet")
      write("events", reps(events) { (e, k) =>
        if (k == 0) e
        else e.withColumn("event_id", col("event_id") + k * 100000000L)
          .withColumn("user_id", col("user_id") + k * 1000000L)
      })
      val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
      write("lineitem", reps(lineitem) { (l, k) =>
        if (k == 0) l else l.withColumn("l_orderkey", col("l_orderkey") + k * 100000000L)
      })
      val orders = spark.read.parquet(s"$src/orders.parquet")
      write("orders", reps(orders) { (o, k) =>
        if (k == 0) o
        else o.withColumn("o_orderkey", col("o_orderkey") + k * 100000000L)
          .withColumn("o_custkey", col("o_custkey") + k * 1000000L)
      })
      val customer = spark.read.parquet(s"$src/customer.parquet")
      write("customer", reps(customer) { (c, k) =>
        if (k == 0) c else c.withColumn("c_custkey", col("c_custkey") + k * 1000000L)
      })
      Seq("part", "supplier", "nation", "region").foreach { t =>
        write(t, spark.read.parquet(s"$src/$t.parquet"))
      }
    }

    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    queries.foreach { name =>
      val fn = SparkEntry.queries(name)
      try {
        fn(spark, out).count() // warmup
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); fn(spark, out).count(); (System.nanoTime() - t0) / 1e9
        }
        println(f"[corescaling] $name cpus=$cpus: ${median(t)}%.3f s (min ${t.min}%.3f)")
      } catch {
        case e: Throwable => println(s"[corescaling] $name FAILED: ${e.getMessage}")
      }
      try spark.sharedState.cacheManager.clearCache() catch { case _: Throwable => () }
      System.gc()
    }
    spark.stop()
  }
}
