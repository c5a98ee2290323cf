package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("heap keeps the best k by (ord desc, id asc), ties to the lower id") {
    val h = new TopKHeap(3)
    Seq((5L, 1L), (9L, 2L), (5L, 0L), (1L, 3L), (9L, 9L)).foreach { case (o, i) => h.add(o, i) }
    // best three: (9,2), (9,9), then ord-5 tie → id 0 beats id 1
    assert(h.sortedPairs.toSeq == Seq((9L, 2L), (9L, 9L), (5L, 0L)))
    // fewer than k stays partial
    val small = new TopKHeap(8)
    small.add(1L, 1L)
    assert(small.sortedPairs.toSeq == Seq((1L, 1L)))
  }

  test("serialize/deserialize round-trips the buffer") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKPairs(Literal(0L), Literal(0L), Literal(3))
    val h = new TopKHeap(3)
    Seq((5L, 1L), (9L, 2L), (7L, 0L), (8L, 4L)).foreach { case (o, i) => h.add(o, i) }
    val back = agg.deserialize(agg.serialize(h))
    assert(back.sortedPairs.toSeq == h.sortedPairs.toSeq)
  }

  test("capPerGroup equals the window rank on a skewed corpus") {
    val s = spark
    import s.implicits._
    // one hot group (900 rows) + two small ones; scores collide heavily
    val rows = (1L to 900L).map(i => ("hot", i, i % 7)) ++
      (1L to 40L).map(i => ("a", 1000L + i, i % 3)) ++
      (1L to 5L).map(i => ("b", 2000L + i, i))
    val df = rows.toDF("src", "id", "score")
    val got = graft.operators.Sampling.capPerGroup(df, "src", col("score"), "id", k = 10)
      .select("src", "id", "ord")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("src").orderBy(col("score").desc, col("id").asc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .select("src", "id", "score")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(got == want)
    // group smaller than k returns all of it
    assert(got.count(_._1 == "b") == 5)
  }

  test("aggregate is k-bounded map-side: partial ObjectHashAggregate before the exchange") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = graft.operators.Sampling.capPerGroup(
        df, "source", TextFunctions.qualityScorePpm(col("text")), "doc_id", 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"not an object-hash aggregate:\n$p")
    assert(p.contains("partial_graft_topk"), s"no map-side partial top-k:\n$p")
    assert(p.contains("Exchange hashpartitioning(source"), s"no source-keyed exchange:\n$p")
  }

  test("sortable-bits double mapping preserves Double.compare order and round-trips") {
    val vals = Seq(Double.NegativeInfinity, -1e300, -2.5, -1e-300, -0.0, 0.0,
      1e-300, 2.5, 1e300, Double.PositiveInfinity, Double.NaN)
    for (a <- vals; b <- vals) {
      assert(java.lang.Long.compare(TopK.toSortable(a), TopK.toSortable(b)).sign ==
        java.lang.Double.compare(a, b).sign, s"order mismatch at ($a, $b)")
    }
    for (v <- vals if !v.isNaN)
      assert(TopK.fromSortable(TopK.toSortable(v)) == v ||
        (v == 0.0 && TopK.fromSortable(TopK.toSortable(v)) == 0.0), s"round-trip broke $v")
    assert(TopK.fromSortable(TopK.toSortable(Double.NaN)).isNaN)
  }

  test("topkPairsDouble equals the window rank, negative and tied scores included") {
    val s = spark
    import s.implicits._
    // scores cross zero and collide; ties must break id ASC like the window
    val df = (1L to 500L).map(i => (i, ((i % 13).toDouble - 6.0) / 7.0)).toDF("id", "cos")
      .withColumn("qid", lit(1L))
    val got = df.groupBy("qid")
      .agg(TopK.topkPairsDouble(col("cos"), col("id"), 25).as("tk"))
      .select(explode(col("tk")).as("p")).select("p.ord", "p.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    val want = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id").asc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 25)
        .orderBy("rn").select("cos", "id")
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    }
    assert(got == want)
  }

  test("graft_topk rejects k <= 0 on the SQL route, same contract as the Column API") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs_topk_k0")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT graft_topk(n_chars, doc_id, 0) FROM docs_topk_k0 GROUP BY source").collect()
    }
    assert(e.getMessage.contains("k must be positive"), e.getMessage)
  }

  test("graft_topk works through the SQL registration route") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs_topk")
    val out = spark.sql(
      """SELECT source, e.id AS doc_id
        |FROM (SELECT source, graft_topk(n_chars, doc_id, 3) AS top
        |      FROM docs_topk GROUP BY source)
        |LATERAL VIEW explode(top) t AS e""".stripMargin)
      .collect()
    assert(out.length == 60, s"expected 20 sources x 3, got ${out.length}")
  }

  test("string-id heap: lexicographic tie-break, serde round-trip") {
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    val h = new TopKStrHeap(3)
    Seq((5L, "b"), (9L, "x"), (5L, "a"), (1L, "z"), (9L, "zz")).foreach {
      case (o, i) => h.add(o, u(i))
    }
    assert(h.sortedPairs.toSeq.map { case (o, i) => (o, i.toString) } ==
      Seq((9L, "x"), (9L, "zz"), (5L, "a")))
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    val agg = TopKPairsStr(Literal(0L), Literal(UTF8String.fromString(""), StringType), Literal(3))
    val back = agg.deserialize(agg.serialize(h))
    assert(back.sortedPairs.toSeq.map { case (o, i) => (o, i.toString) } ==
      h.sortedPairs.toSeq.map { case (o, i) => (o, i.toString) })
  }

  test("capPerGroup with STRING ids and DOUBLE ord equals the window rank") {
    val s = spark
    import s.implicits._
    // string ids (URL-ish) would null out through the long-id cast;
    // fractional scores would collapse through a long cast — both must
    // route through the type-aware dispatch and match the window
    val rows = (1L to 400L).map(i =>
      (if (i % 3 == 0) "big" else "small", s"url-${"%04d".format(i)}", (i % 17).toDouble / 7.0))
    val df = rows.toDF("domain", "url", "quality")
    val got = graft.operators.Sampling.capPerGroup(df, "domain", col("quality"), "url", k = 7)
      .select("domain", "url", "ord")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val want = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("domain").orderBy(col("quality").desc, col("url").asc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
        .select("domain", "url", "quality")
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    }
    assert(got.nonEmpty && got == want)
  }

  test("bm25TopKAgainst returns results for string corpus ids") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      ("doc-a", "spark streams data with spark engines"),
      ("doc-b", "cooking pasta with tomatoes"),
      ("doc-c", "spark catalyst optimizer rules")).toDF("doc_id", "text")
    val queries = Seq((1L, "spark rules")).toDF("qid", "qtext")
    val idx = graft.operators.TextSim.bm25Index(corpus, "doc_id", "text")
    val out = graft.operators.TextSim.bm25TopKAgainst(idx, queries, "qid", "qtext", k = 2)
      .collect()
    assert(out.nonEmpty, "string-id corpus returned an empty top-k")
    val ids = out.map(_.getAs[String]("nid")).toSet
    assert(ids.subsetOf(Set("doc-a", "doc-b", "doc-c")) && ids.contains("doc-c"))
  }
}
