package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** Decontamination and repetition-scoring semantics. */
class DecontaminateSpec extends SparkSpec {

  test("flag marks exactly the train docs sharing an n-gram with eval") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),      // contains eval 5-gram
      (2L, "one two three four five six seven"),        // disjoint
      (3L, "alpha beta gamma X delta epsilon")          // shares words, no 5-gram
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "Z alpha beta gamma delta epsilon Q")).toDF("doc_id", "text")
    val out = Decontaminate.flag(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("contaminated"))).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
    // apply() drops exactly the flagged rows
    val kept = Decontaminate(train, eval, "doc_id", "text", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("flagWithBloom equals flag exactly (sketch hits are confirmed, no false negatives)") {
    import spark.implicits._
    // 60 docs, ~1/4 genuinely contaminated, plus near-miss wording so
    // the confirm join has sketch false positives to reject
    val train = (1L to 60L).map { i =>
      val base = s"doc $i alpha beta gamma delta idx${i % 7} tail words here"
      val text = if (i % 4 == 0) s"$base leak marker phrase number ${i % 3} end" else base
      (i, text)
    }.toDF("doc_id", "text")
    val eval = (0L to 2L).map(j => (1000L + j, s"held out leak marker phrase number $j end"))
      .toDF("doc_id", "text")
    def collectFlags(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("contaminated"))).toMap
    val exact = collectFlags(Decontaminate.flag(train, eval, "doc_id", "text", n = 5))
    // fpp high enough that false positives actually occur at this size
    val bloom = collectFlags(Decontaminate.flagWithBloom(train, eval, "doc_id", "text",
      n = 5, fpp = 0.2))
    assert(bloom == exact, s"bloom path diverged: ${bloom.toSet.diff(exact.toSet)}")
    assert(exact.values.count(identity) == 15, exact.toString)
  }

  test("flag is row-preserving and the eval side broadcasts") {
    import spark.implicits._
    val train = (1 to 50).map(i => (i.toLong, s"doc $i body word$i tail end here")).toDF("doc_id", "text")
    val eval = Seq((0L, "doc 7 body word7 tail end here")).toDF("doc_id", "text")
    val flagged = Decontaminate.flag(train, eval, "doc_id", "text", 5)
    assert(flagged.count() == 50)
    val plan = flagged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval grams should broadcast:\n$plan")
  }

  test("fuzzyFlag catches a near-duplicate that exact n-grams can miss") {
    import spark.implicits._
    val evalText = (1 to 200).map("w" + _).mkString(" ")
    // near-dup: a word changed every 12 tokens — every 13-gram window
    // is broken, but ~85% of 3-gram shingles (and with 2-row bands,
    // the minhash bands) survive
    val nearDup = (1 to 200).map(i => if (i % 12 == 0) s"X$i" else s"w$i").mkString(" ")
    val train = Seq(
      (1L, nearDup),
      (2L, (100 to 140).map("z" + _).mkString(" "))
    ).toDF("doc_id", "text")
    val eval = Seq((0L, evalText)).toDF("doc_id", "text")
    val exact = Decontaminate.flag(train, eval, "doc_id", "text", n = 13)
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("contaminated"))).toMap
    val fuzzy = Decontaminate.fuzzyFlag(train, eval, "doc_id", "text", n = 3, k = 8, bands = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("contaminated"))).toMap
    assert(!exact(1L), "13-gram flag should miss the paraphrase")
    assert(fuzzy(1L), "minhash-band flag should catch the paraphrase")
    assert(!fuzzy(2L))
  }

  test("fuzzyFlag: short docs have no minhash identity and are never flagged") {
    import spark.implicits._
    // an eval set with a two-word answer ("yes sir" has no 3-gram):
    // before the empty-band guard, its all-null signature rendered the
    // same degenerate band keys as EVERY short train doc, mass-flagging
    // unrelated short text as benchmark leakage
    val eval = Seq((100L, "yes sir"), (101L, (1 to 50).map("e" + _).mkString(" "))).toDF("doc_id", "text")
    val train = Seq(
      (1L, "no"),                                        // short, unrelated
      (2L, "totally different"),                         // short, unrelated
      (3L, null.asInstanceOf[String]),                   // null text
      (4L, (1 to 50).map("e" + _).mkString(" ")))        // true near-dup
      .toDF("doc_id", "text")
    val fuzzy = Decontaminate.fuzzyFlag(train, eval, "doc_id", "text", n = 3, k = 8, bands = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("contaminated"))).toMap
    assert(!fuzzy(1L) && !fuzzy(2L) && !fuzzy(3L),
      s"short/null docs must not be degenerate-band flagged: $fuzzy")
    assert(fuzzy(4L), "a real near-dup must still be caught")
  }

  test("flagStreaming treats null text as uncontaminated, exactly like flag") {
    import spark.implicits._
    val eval = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq((1L, "the quick brown fox jumps today"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // batch-driving the streaming operator (its contract): the null-text
    // row must come back contaminated = false, not null (a null would
    // be DROPPED by filter(!contaminated), diverging from flag())
    val streaming = Decontaminate.flagStreaming(train, eval, "doc_id", "text", n = 3)
      .select("doc_id", "contaminated")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val batch = Decontaminate.flag(train, eval, "doc_id", "text", n = 3)
      .select("doc_id", "contaminated")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(streaming == Map(1L -> true, 2L -> false))
    assert(streaming == batch)
  }

  test("repetitionPpm measures the repeated-shingle fraction exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c a b c a b c"),  // 7 trigrams, 3 distinct → 4/7 repeats
      (2L, "u v w x y z"),        // 4 trigrams, all distinct → 0
      (3L, "x y")                 // too short → 0 shingles → 0
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextFunctions.repetitionPpm(col("text"), 3).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 4L * 1000000L / 7L)
    assert(out(2L) == 0L && out(3L) == 0L)
  }

  test("flagStreaming runs on a real readStream and matches the batch flag") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("decon_stream").toString
    val (inDir, outDir, cpDir) = (s"$root/in", s"$root/out", s"$root/cp")
    new java.io.File(inDir).mkdirs()
    val evalDocs = Seq((100L, "the quick brown fox jumps over a lazy dog")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix words then the quick brown fox jumps over something"),
      (2L, "completely clean text with no overlap at all here today")
    )
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inDir/b1.json"),
      train.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }.mkString("\n"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).json(inDir)
    val q = Decontaminate.flagStreaming(stream, evalDocs, "doc_id", "text", n = 5)
      .select("doc_id", "contaminated")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", cpDir).outputMode("append").start()
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    val streamed = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val batch = Decontaminate.flag(train.toDF("doc_id", "text"), evalDocs,
        "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(streamed == Map(1L -> true, 2L -> false), streamed.toString)
    assert(streamed == batch)
  }

  test("overlapScore: exact ppm, agrees with flag, zero for gram-less docs") {
    import spark.implicits._
    val train = Seq(
      // 6 words -> 2 distinct 5-grams, 1 of them in eval -> 500000 ppm
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"), // disjoint -> 0 ppm
      (3L, "tiny doc")                           // < n words -> n_grams = 0
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "Z alpha beta gamma delta epsilon Q")).toDF("doc_id", "text")
    val score = Decontaminate.overlapScore(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(r.fieldIndex("n_grams")), r.getLong(r.fieldIndex("hits")),
          r.getLong(r.fieldIndex("hit_ppm"))))).toMap
    assert(score == Map(
      1L -> ((2L, 1L, 500000L)),
      2L -> ((3L, 0L, 0L)),
      3L -> ((0L, 0L, 0L))), score.toString)
    // policy invariant: hit_ppm > 0 exactly where flag says contaminated
    val flagged = Decontaminate.flag(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("contaminated"))).toMap
    assert(score.keySet == flagged.keySet)
    score.foreach { case (id, (_, _, ppm)) => assert((ppm > 0) == flagged(id), s"doc $id") }
  }

  test("overlapScore aggregates duplicate ids as one document (ppm stays <= 1e6)") {
    import spark.implicits._
    val train = Seq( // same id twice: 2 + 3 grams, 1 + 0 hits -> 200000 ppm
      (1L, "alpha beta gamma delta epsilon zeta"),
      (1L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val rows = Decontaminate.overlapScore(train, eval, "doc_id", "text", n = 5).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(r.fieldIndex("n_grams")), r.getLong(r.fieldIndex("hits")),
      r.getLong(r.fieldIndex("hit_ppm"))) == ((5L, 1L, 200000L)))
    // reserved output names are rejected up front, not silently shadowed
    intercept[IllegalArgumentException] {
      Decontaminate.overlapScore(train.withColumnRenamed("doc_id", "hits"), eval,
        "hits", "text", n = 5)
    }
  }
}
