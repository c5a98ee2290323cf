package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import StatefulOps._

class StatefulOpsSpec extends SparkSpec {

  test("streaming dedup emits first event per key, suppresses duplicates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Keyed]
    val result = streamingDedup(input.toDS(), ttlMs = 0L)

    val query = result.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append")
      .start()

    // batch 1: k1 twice (second is a dup), k2 once
    input.addData(Keyed("k1", "a", 100L), Keyed("k1", "b", 200L), Keyed("k2", "c", 50L))
    query.processAllAvailable()
    // batch 2: k1 again (dup of state), k3 new
    input.addData(Keyed("k1", "d", 300L), Keyed("k3", "e", 10L))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("dedup_out").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.toList == List(
      ("k1", "a", 100L, 1L), // first k1 event, one dup in same batch
      ("k2", "c", 50L, 0L),
      ("k3", "e", 10L, 0L)))
  }

  test("TTL branch: timed-out state is removed; re-arriving key emits again") {
    import org.apache.spark.sql.streaming.TestGroupState
    // first arrival emits
    val s1 = TestGroupState.create[SeenState](
      optionalState = org.apache.spark.api.java.Optional.empty(), timeoutConf =
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    val out1 = dedupGroup("k", Iterator(Keyed("k", "v1", 10L), Keyed("k", "v2", 20L)), s1, 60000L)
    assert(out1.toList == List(DedupResult("k", "v1", 10L, 1L)))
    assert(s1.get == SeenState(10L, 2L))

    // duplicate in a later batch: suppressed, count bumps
    val s2 = TestGroupState.create[SeenState](
      optionalState = org.apache.spark.api.java.Optional.of(SeenState(10L, 2L)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 2000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    assert(dedupGroup("k", Iterator(Keyed("k", "v3", 30L)), s2, 60000L).isEmpty)
    assert(s2.get == SeenState(10L, 3L))

    // timeout fires: state removed, nothing emitted
    val s3 = TestGroupState.create[SeenState](
      optionalState = org.apache.spark.api.java.Optional.of(SeenState(10L, 3L)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 99999L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = true)
    assert(dedupGroup("k", Iterator.empty, s3, 60000L).isEmpty)
    assert(s3.isRemoved)
  }

  test("streaming near-dup candidates pair arrivals with residents across batches") {
    implicit val sqlCtx = spark.sqlContext
    val s = spark
    import s.implicits._
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val result = streamingNearDupCandidates(docs, "doc_id", "text")

    val query = result.writeStream
      .format("memory").queryName("neardup_out")
      .outputMode("append")
      .start()

    val dupText = "the quick brown fox jumps over the lazy dog again"
    // batch 1: two near-identical docs + one unrelated
    input.addData((1L, dupText), (2L, dupText), (3L, "completely different words with no overlap at all"))
    query.processAllAvailable()
    // batch 2: a third copy arrives later — must pair with BOTH residents
    input.addData((4L, dupText))
    query.processAllAvailable()
    query.stop()

    val pairs = spark.table("neardup_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)), s"got $pairs")
  }

  test("UNCAPPED batch-driven near-dup audit: equals the batch LSH self-join") {
    // The truly-uncapped configuration lives here as a spec-only audit
    // (the oracled/benched entries use finite caps — an unbounded
    // bucket pairs O(bucket²) and is a straggler-killer at scale):
    // batch-driving the stream operator with maxBucket=Int.MaxValue and
    // distinct-ing must reproduce the batch operator's full pairing.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val streamed = streamingNearDupCandidates(docs, "doc_id", "text",
        n = 3, k = 8, bands = 2, maxBucket = Int.MaxValue)
      .toDF().select("da", "db").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.Dedup.minhashLshCandidates(
        docs, "doc_id", "text", n = 3, k = 8, bands = 2,
        maxBandOccupancy = Long.MaxValue)
      .select("da", "db").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("CAPPED near-dup: only the maxBucket smallest ids per band pair") {
    // mirrors dd_neardup_stateful_capped's oracle contract: within one
    // batch the group's distinct ids arrive sorted, so residents are
    // the maxBucket smallest and later ids neither pair nor enter state
    val s = spark
    import s.implicits._
    val dup = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq((5L, dup), (1L, dup), (3L, dup), (9L, dup))
      .toDF("doc_id", "text")
    val pairs = streamingNearDupCandidates(docs, "doc_id", "text",
        n = 3, k = 8, bands = 2, maxBucket = 2)
      .toDF().select("da", "db").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)), s"got $pairs")
  }

  test("event-time near-dup: bucket state expires by WATERMARK, not wall clock") {
    implicit val sqlCtx = spark.sqlContext
    val s = spark
    import s.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val dup = "the quick brown fox jumps over the lazy dog again"
    val other = "completely different words with no overlap at all today"
    val other2 = "yet another unrelated sentence about gardening and mild weather patterns"
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val result = streamingNearDupCandidatesEventTime(
      input.toDF().toDF("doc_id", "text", "ts"),
      "doc_id", "text", eventTimeCol = "ts", watermarkDelay = "0 seconds",
      ttlMs = 10 * 60 * 1000L)
    val q = result.toDF().writeStream.format("memory").queryName("nd_et")
      .outputMode("append").start()
    try {
      // two dups at 10:00 pair; bucket expiry set to 10:10
      input.addData((1L, dup, ts(0)), (2L, dup, ts(0)))
      q.processAllAvailable()
      // advance the watermark far past the expiry (unrelated text);
      // the timeout for the idle dup-bucket fires on the NEXT trigger
      input.addData((50L, other, ts(40)))
      q.processAllAvailable()
      input.addData((51L, other2, ts(41)))
      q.processAllAvailable()
      // a new copy of the dup arrives: the expired bucket is EMPTY, so
      // no pairs with the long-gone residents — a wall-clock TTL in a
      // fast replay would still hold docs 1 and 2 and emit stale pairs
      input.addData((3L, dup, ts(45)))
      q.processAllAvailable()
      val pairs = spark.table("nd_et").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L)), s"expired residents still paired: $pairs")
    } finally q.stop()
  }

  test("streaming keep-latest emits a key's new winner only when it changes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Keyed]
    val result = streamingKeepLatest(input.toDS(), ttlMs = 0L)
    val query = result.writeStream
      .format("memory").queryName("latest_out")
      .outputMode("append")
      .start()
    // batch 1: k1 gets two versions (200 wins), k2 one
    input.addData(Keyed("k1", "v1", 100L), Keyed("k1", "v2", 200L), Keyed("k2", "x", 50L))
    query.processAllAvailable()
    // batch 2: stale k1 update (no emit) and a real k2 update (emit)
    input.addData(Keyed("k1", "old", 150L), Keyed("k2", "y", 90L))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("latest_out").collect()
      .map(r => (r.getString(0), r.getStruct(1).getLong(0), r.getStruct(1).getString(1)))
    // per batch per key at most one emission; stale k1 suppressed
    assert(rows.count(_._1 == "k1") == 1)
    assert(rows.filter(_._1 == "k1").head == (("k1", 200L, "v2")))
    assert(rows.filter(_._1 == "k2").map(t => (t._2, t._3)).sorted.toList ==
      List((50L, "x"), (90L, "y")))
  }

  test("keep-latest transition: timestamp tie broken deterministically, stale rejected") {
    import org.apache.spark.sql.streaming.TestGroupState
    def st(v: Option[Latest]) = TestGroupState.create[Latest](
      optionalState = v.map(org.apache.spark.api.java.Optional.of[Latest])
        .getOrElse(org.apache.spark.api.java.Optional.empty[Latest]()),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    // equal timestamps: max of the VALUE itself wins — same rule as
    // batch max(struct(ts, value)). "z" > "aa" in byte order even
    // though "aa".hashCode > "z".hashCode, so a hash-based tie would
    // disagree with batch here.
    val a = Keyed("k", "z", 100L); val b = Keyed("k", "aa", 100L)
    assert("z".hashCode < "aa".hashCode) // the case hashes get backwards
    val s0 = st(None)
    val first = keepLatestGroup("k", Iterator(a, b), s0, ttlMs = 0L).toList
    assert(first.map(_._2.value) == List("z"))
    // a strictly-older arrival never displaces the state
    val s1 = st(Some(Latest(200L, "cur")))
    assert(keepLatestGroup("k", Iterator(Keyed("k", "z", 150L)), s1, ttlMs = 0L).isEmpty)
    assert(s1.get.value == "cur")
    // equal-ts equal-value re-arrival: no re-emit (cur wins ties)
    val s2 = st(Some(Latest(200L, "cur")))
    assert(keepLatestGroup("k", Iterator(Keyed("k", "cur", 200L)), s2, ttlMs = 0L).isEmpty)
    // batch parity on the tie itself: against state (100, "aa"), value
    // "z" at the same ts wins exactly as the batch struct-max would
    val s3 = st(Some(Latest(100L, "aa")))
    assert(keepLatestGroup("k", Iterator(Keyed("k", "z", 100L)), s3, ttlMs = 0L)
      .toList.map(_._2.value) == List("z"))
  }

  test("streaming mixture: budget admission transitions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MixtureEvent]
    val result = streamingMixtureByTokenBudget(input.toDS(), _ => 10L)
    val query = result.writeStream
      .format("memory").queryName("mix_out")
      .outputMode("append")
      .start()
    // batch 1: two docs fit (4 + 4 = 8 <= 10)
    input.addData(MixtureEvent("web", 1L, 4L), MixtureEvent("web", 2L, 4L))
    query.processAllAvailable()
    // batch 2: the next doc crosses the budget (8 + 3 = 11 > 10) and is
    // cut; the group is spent, so later small docs stay cut too (the
    // batch filter's inclusive-cumsum rule)
    input.addData(MixtureEvent("web", 3L, 3L))
    query.processAllAvailable()
    input.addData(MixtureEvent("web", 4L, 1L), MixtureEvent("code", 9L, 7L))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("mix_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    assert(rows.toList == List(("code", 9L, 7L), ("web", 1L, 4L), ("web", 2L, 8L)),
      rows.toList.toString)
  }

  test("streaming mixture batch-drive equals the batch two-phase cumsum operator") {
    val s = spark
    import s.implicits._
    import graft.operators.Sampling
    val docs = (1L to 40L).map(k => (if (k % 3 == 0) "a" else "b", k, k % 7 + 1))
      .toDF("source", "doc_id", "tok")
    val batch = Sampling.mixtureByTokenBudget(docs, "source", "doc_id", "tok",
        _ => org.apache.spark.sql.functions.lit(25L))
      .select("source", "doc_id", "cum_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val ev = docs.select(
      org.apache.spark.sql.functions.col("source").as("group"),
      org.apache.spark.sql.functions.col("doc_id").as("key"),
      org.apache.spark.sql.functions.col("tok").cast("long").as("tok")).as[MixtureEvent]
    val streamed = streamingMixtureByTokenBudget(ev, _ => 25L)
      .collect().map(k => (k.group, k.key, k.cumTokens)).toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("streaming pack: offsets and window ids carry across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChunkEvent]
    val result = streamingPackOffsets(input.toDS(), budget = 8L)
    val query = result.writeStream
      .format("memory").queryName("pack_out")
      .outputMode("append")
      .start()
    input.addData(ChunkEvent("s", 1L, 0L, 5L), ChunkEvent("s", 2L, 0L, 4L))
    query.processAllAvailable()
    input.addData(ChunkEvent("s", 3L, 0L, 2L), ChunkEvent("s", 3L, 1L, 0L))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("pack_out").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(t => (t._1, t._2))
    assert(rows.toList == List(
      (1L, 0L, 0L, 0L, 0L),  // tokens 0-4 inside window 0
      (2L, 0L, 5L, 0L, 1L),  // 5-8 straddles the window-0/1 boundary
      (3L, 0L, 9L, 1L, 1L),
      (3L, 1L, 11L, 1L, 1L)  // zero-token chunk pins to win_first
    ), rows.toList.toString)
  }

  test("streaming pack batch-drive equals packOffsets") {
    val s = spark
    import s.implicits._
    import graft.operators.Packing
    val chunks = (1L to 30L).map(id => ("s", id, 0L, id % 5 + 1)).toDF("stream", "id", "idx", "tok")
    val batch = Packing.packOffsets(spark, chunks, "id", "idx", "tok", budget = 16L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val streamed = streamingPackOffsets(chunks.as[ChunkEvent], budget = 16L)
      .collect().map(p => (p.id, p.idx, p.startTok, p.winFirst, p.winLast)).toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("streaming mixture budget state survives a checkpointed query restart") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("mix_restart").toString
    val (inDir, cpDir) = (s"$root/in", s"$root/cp")
    new java.io.File(inDir).mkdirs()
    def writeBatch(name: String, rows: Seq[MixtureEvent]): Unit = {
      // atomic move so the file source never lists a half-written file
      val tmp = java.nio.file.Files.createTempFile("mixb", ".json")
      java.nio.file.Files.writeString(tmp,
        rows.map(e => s"""{"group":"${e.group}","key":${e.key},"tok":${e.tok}}""")
          .mkString("\n"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$inDir/$name.json"))
    }
    val schema = implicitly[org.apache.spark.sql.Encoder[MixtureEvent]].schema
    val outDir = s"$root/out"
    def run(): Unit = {
      val in = spark.readStream.schema(schema).json(inDir).as[MixtureEvent]
      val q = streamingMixtureByTokenBudget(in, _ => 10L).toDF()
        .writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", cpDir)
        .outputMode("append")
        .start()
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
    }
    writeBatch("b1", Seq(MixtureEvent("web", 1L, 4L), MixtureEvent("web", 2L, 4L)))
    run() // first incarnation admits 4 and 8
    writeBatch("b2", Seq(MixtureEvent("web", 3L, 3L), MixtureEvent("web", 4L, 1L)))
    run() // restarted incarnation must resume cum=8, cutting 3 (11>10) and 1
    val rows = spark.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    // the restored state (cum=8) must reject both post-restart arrivals;
    // lost state would admit key 3 at cum=3 and key 4 at cum=4
    assert(rows.toList == List(("web", 1L, 4L), ("web", 2L, 8L)),
      s"budget state lost across restart: ${rows.toList}")
  }

  test("streaming top-k state survives a checkpointed query restart") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("topk_restart").toString
    val (inDir, cpDir, outDir) = (s"$root/in", s"$root/cp", s"$root/out")
    new java.io.File(inDir).mkdirs()
    def writeBatch(name: String, rows: Seq[(String, Long, Long)]): Unit = {
      val tmp = java.nio.file.Files.createTempFile("tkb", ".json")
      java.nio.file.Files.writeString(tmp,
        rows.map { case (k, o, i) => s"""{"key":"$k","ord":$o,"id":$i}""" }.mkString("\n"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$inDir/$name.json"))
    }
    val schema = implicitly[org.apache.spark.sql.Encoder[KeyedOrd]].schema
    def run(): Unit = {
      val in = spark.readStream.schema(schema).json(inDir)
      val q = streamingTopK(in, "key", col("ord"), "id", k = 2).toDF()
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cpDir)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    writeBatch("b1", Seq(("src", 9L, 1L), ("src", 5L, 2L)))
    run() // leaderboard after b1: (9,1)(5,2)
    writeBatch("b2", Seq(("src", 7L, 3L)))
    run() // restored state must displace (5,2): snapshot (9,1)(7,3)
    val snaps = spark.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // with state lost, batch 2 would emit (7,3) alone as the full top-2
    // and never re-emit (9,1); with state kept the b2 snapshot is both
    val b2 = snaps.filter(_._3 == 3L)
    assert(b2.nonEmpty && snaps.count(t => t._2 == 9L && t._3 == 1L) == 2,
      s"top-k state lost across restart: ${snaps.toList}")
  }

  test("near-dup bucket state survives a checkpointed query restart") {
    val root = java.nio.file.Files.createTempDirectory("nd_restart").toString
    val (inDir, cpDir, outDir) = (s"$root/in", s"$root/cp", s"$root/out")
    new java.io.File(inDir).mkdirs()
    val dup = "the quick brown fox jumps over the lazy dog again"
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempFile("ndb", ".json")
      java.nio.file.Files.writeString(tmp,
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }.mkString("\n"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$inDir/$name.json"))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, text STRING")
    def run(): Unit = {
      val in = spark.readStream.schema(schema).json(inDir)
      val q = streamingNearDupCandidates(in, "doc_id", "text").toDF()
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cpDir)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    writeBatch("b1", Seq((1L, dup), (2L, dup)))
    run() // residents {1,2}; pair (1,2)
    writeBatch("b2", Seq((3L, dup)))
    run() // restored residents must pair 3 with BOTH; lost state → nothing
    val pairs = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"bucket state lost across restart: $pairs")
  }

  test("streaming KMV state survives a checkpointed query restart") {
    // the classic silent breaker is a state-schema mismatch on restore;
    // this drill restarts the query from its checkpoint between batches
    // and proves the union-so-far sketch, not just within-run state
    val root = java.nio.file.Files.createTempDirectory("kmv_restart").toString
    val (inDir, cpDir, outDir) = (s"$root/in", s"$root/cp", s"$root/out")
    new java.io.File(inDir).mkdirs()
    def writeBatch(name: String, rows: Seq[(String, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempFile("kmvb", ".json")
      java.nio.file.Files.writeString(tmp,
        rows.map { case (k, v) => s"""{"key":"$k","value":"$v"}""" }.mkString("\n"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$inDir/$name.json"))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL("key STRING, value STRING")
    def run(): Unit = {
      val in = spark.readStream.schema(schema).json(inDir)
      val q = streamingDistinctKmv(in, "key", "value", k = 4).toDF()
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cpDir)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    writeBatch("b1", Seq(("src", "v1"), ("src", "v2")))
    run() // snapshot after b1: 2 distinct (exact, below k)
    writeBatch("b2", Seq(("src", "v2"), ("src", "v3")))
    run() // restored sketch must union: {v1,v2,v3} → 3; lost state → 2
    val snaps = spark.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    assert(snaps.contains(("src", 2L, 2L)), s"b1 snapshot missing: $snaps")
    assert(snaps.contains(("src", 3L, 3L)),
      s"KMV state lost across restart (b2 snapshot should be 3 distinct): $snaps")
  }

  test("streaming top-k: a re-delivered id updates its resident entry, never occupies a second slot") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("topk_redeliver").toString
    val (inDir, cpDir, outDir) = (s"$root/in", s"$root/cp", s"$root/out")
    new java.io.File(inDir).mkdirs()
    def writeBatch(name: String, rows: Seq[(String, Long, Long)]): Unit = {
      val tmp = java.nio.file.Files.createTempFile("tkr", ".json")
      java.nio.file.Files.writeString(tmp,
        rows.map { case (k, o, i) => s"""{"key":"$k","ord":$o,"id":$i}""" }.mkString("\n"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$inDir/$name.json"))
    }
    val schema = implicitly[org.apache.spark.sql.Encoder[KeyedOrd]].schema
    val in = spark.readStream.schema(schema).json(inDir)
    val q = streamingTopK(in, "key", col("ord"), "id", k = 2).toDF()
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", cpDir)
      .outputMode("append").start()
    writeBatch("b1", Seq(("src", 9L, 1L), ("src", 5L, 2L)))
    q.processAllAvailable() // snapshot: (9,1)(5,2)
    // batch 2, against restored state: id 1 re-delivered verbatim (at-least-once
    // source), id 2 re-observed BETTER, id 3 new but below the board
    writeBatch("b2", Seq(("src", 9L, 1L), ("src", 6L, 2L), ("src", 4L, 3L)))
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    val snaps = spark.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // double-counting id 1 would evict id 2 from the b2 snapshot entirely
    val b2 = snaps.diff(Seq(("src", 9L, 1L), ("src", 5L, 2L))).sorted.reverse
    assert(b2 == Seq(("src", 9L, 1L), ("src", 6L, 2L)),
      s"redelivered id mishandled; batch-2 snapshot: $b2 (all: ${snaps.toList})")
  }

  test("streamingTopKAny: string ids + double ords match capPerGroup; long path fails loud on both") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (1 to 300).map(i =>
      (if (i % 2 == 0) "big" else "small", (i % 17).toDouble / 7.0, s"url-${"%03d".format(i)}"))
    val df = rows.toDF("key", "ord", "id")
    // batch-drive the stateful transition via MemoryStream
    val ms = MemoryStream[(String, Double, String)](spark)
    ms.addData(rows)
    val out = streamingTopKAny(ms.toDF().toDF("key", "ord", "id"), "key", col("ord"), "id", k = 5)
    val root = java.nio.file.Files.createTempDirectory("topk_any").toString
    val q = out.toDF().writeStream.format("memory").queryName("topk_any_snap")
      .option("checkpointLocation", s"$root/cp").outputMode("append").start()
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    val got = spark.table("topk_any_snap").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    val want = graft.operators.Sampling.capPerGroup(df, "key", col("ord"), "id", k = 5)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getString(1))).toSet
    assert(got == want, s"streaming snapshot != batch capPerGroup:\n$got\nvs\n$want")
    // the long-state entry points refuse the types that would corrupt
    val e1 = intercept[IllegalArgumentException] {
      streamingTopK(df, "key", col("ord"), "id", k = 5)
    }
    assert(e1.getMessage.contains("streamingTopKAny"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      streamingTopK(df.withColumn("ord", (col("ord") * 100).cast("long")), "key", col("ord"), "id", k = 5)
    }
    assert(e2.getMessage.contains("string ids"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      streamingTopKAny(df, "key", col("ord"), "id", k = 0)
    }
    assert(e3.getMessage.contains("positive"), e3.getMessage)
  }

  test("streamingTopKAny upserts duplicate ids (documented divergence from the batch heap)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // id "dup" arrives twice with different ords. The streaming state
    // keys on id and keeps only its best ord (at-least-once safety);
    // the batch heap has no id identity and keeps both rows. k = 3
    // makes the divergence visible: batch fills the board with
    // (9.0,dup),(7.0,dup),(5.0,a); streaming upserts dup and keeps
    // (9.0,dup),(5.0,a),(3.0,b). Pins the contract documented on
    // topKGroupAny — batch-equals holds only for unique (key, id).
    val rows = Seq(("k", 9.0, "dup"), ("k", 7.0, "dup"), ("k", 5.0, "a"), ("k", 3.0, "b"))
    val ms = MemoryStream[(String, Double, String)](spark)
    ms.addData(rows)
    val out = streamingTopKAny(ms.toDF().toDF("key", "ord", "id"), "key", col("ord"), "id", k = 3)
    val root = java.nio.file.Files.createTempDirectory("topk_dup").toString
    val q = out.toDF().writeStream.format("memory").queryName("topk_dup_snap")
      .option("checkpointLocation", s"$root/cp").outputMode("append").start()
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    val got = spark.table("topk_dup_snap").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    assert(got == Set(("k", 9.0, "dup"), ("k", 5.0, "a"), ("k", 3.0, "b")),
      s"streaming per-id upsert violated: $got")
    val batch = graft.operators.Sampling.capPerGroup(
        rows.toDF("key", "ord", "id"), "key", col("ord"), "id", k = 3)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getString(1))).toSet
    assert(batch == Set(("k", 9.0, "dup"), ("k", 7.0, "dup"), ("k", 5.0, "a")),
      s"batch per-row heap changed — update topKGroupAny's contract doc: $batch")
    assert(got != batch, "divergence disappeared; contract doc is stale")
  }

  test("streaming pack offset state survives a checkpointed query restart") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("pack_restart").toString
    val (inDir, cpDir, outDir) = (s"$root/in", s"$root/cp", s"$root/out")
    new java.io.File(inDir).mkdirs()
    def writeBatch(name: String, rows: Seq[ChunkEvent]): Unit = {
      val tmp = java.nio.file.Files.createTempFile("packb", ".json")
      java.nio.file.Files.writeString(tmp,
        rows.map(e => s"""{"stream":"${e.stream}","id":${e.id},"idx":${e.idx},"tok":${e.tok}}""")
          .mkString("\n"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$inDir/$name.json"))
    }
    val schema = implicitly[org.apache.spark.sql.Encoder[ChunkEvent]].schema
    def run(): Unit = {
      val in = spark.readStream.schema(schema).json(inDir).as[ChunkEvent]
      val q = streamingPackOffsets(in, budget = 8L).toDF()
        .writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", cpDir)
        .outputMode("append")
        .start()
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
    }
    writeBatch("b1", Seq(ChunkEvent("s", 1L, 0L, 5L), ChunkEvent("s", 2L, 0L, 4L)))
    run()
    writeBatch("b2", Seq(ChunkEvent("s", 3L, 0L, 2L)))
    run() // restarted incarnation must resume the offset at 9, not 0
    val rows = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1)
    assert(rows.toList == List(
      (1L, 0L, 0L, 0L),
      (2L, 5L, 0L, 1L),
      (3L, 9L, 1L, 1L) // lost state would restart the stream at offset 0
    ), s"offset state lost across restart: ${rows.toList}")
  }

  test("sharded pack: shard-local offsets, stitched window ids, equals the serial op per shard") {
    val s = spark
    import s.implicits._
    val numShards = 3
    val chunks = (1L to 40L).map(id =>
      ("s", (id % numShards).toInt, id, 0L, id % 5 + 1))
      .toDF("stream", "shard", "id", "idx", "tok")
    val sharded = streamingPackOffsetsSharded(
        chunks.as[ShardedChunkEvent], budget = 16L, numShards = numShards)
      .collect().map(p => (p.shard, p.id, p.startTok, p.winFirst, p.winLast)).toSet
    // reference: the SERIAL operator on each shard's slice, window ids
    // mapped w -> w*numShards + shard — the stitching contract
    val serial = (0 until numShards).flatMap { sh =>
      streamingPackOffsets(
          chunks.filter($"shard" === sh).select("stream", "id", "idx", "tok").as[ChunkEvent],
          budget = 16L)
        .collect().map(p => (sh, p.id, p.startTok,
          p.winFirst * numShards + sh, p.winLast * numShards + sh))
    }.toSet
    assert(sharded == serial, s"sharded=$sharded serial=$serial")
    // window ids are globally unique across shards: no window id maps
    // to two different shards
    val winOwners = sharded.toSeq.flatMap(p => Seq(p._4 -> p._1, p._5 -> p._1)).distinct
    assert(winOwners.groupBy(_._1).forall(_._2.size == 1),
      s"a stitched window id crossed shards: $winOwners")
  }

  test("sharded pack offset state survives a checkpointed query restart, shards independent") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("shpack_restart").toString
    val (inDir, cpDir, outDir) = (s"$root/in", s"$root/cp", s"$root/out")
    new java.io.File(inDir).mkdirs()
    def writeBatch(name: String, rows: Seq[ShardedChunkEvent]): Unit = {
      val tmp = java.nio.file.Files.createTempFile("shpackb", ".json")
      java.nio.file.Files.writeString(tmp,
        rows.map(e => s"""{"stream":"${e.stream}","shard":${e.shard},"id":${e.id},"idx":${e.idx},"tok":${e.tok}}""")
          .mkString("\n"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$inDir/$name.json"))
    }
    val schema = implicitly[org.apache.spark.sql.Encoder[ShardedChunkEvent]].schema
    def run(): Unit = {
      val in = spark.readStream.schema(schema).json(inDir).as[ShardedChunkEvent]
      val q = streamingPackOffsetsSharded(in, budget = 8L, numShards = 2).toDF()
        .writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", cpDir)
        .outputMode("append")
        .start()
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
    }
    writeBatch("b1", Seq(
      ShardedChunkEvent("s", 0, 1L, 0L, 5L), ShardedChunkEvent("s", 1, 2L, 0L, 7L)))
    run()
    writeBatch("b2", Seq(
      ShardedChunkEvent("s", 0, 3L, 0L, 4L), ShardedChunkEvent("s", 1, 4L, 0L, 2L)))
    run() // each shard must resume ITS OWN offset (5 and 7), not 0
    val rows = spark.read.parquet(outDir).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._2)
    assert(rows.toList == List(
      (0, 1L, 0L, 0L, 0L),  // shard 0 window 0 -> global 0
      (1, 2L, 0L, 1L, 1L),  // shard 1 window 0 -> global 1
      (0, 3L, 5L, 0L, 2L),  // 5..8 straddles shard-0 windows 0,1 -> global 0,2
      (1, 4L, 7L, 1L, 3L)   // 7..8 straddles shard-1 windows 0,1 -> global 1,3
    ), s"shard state lost or mis-stitched across restart: ${rows.toList}")
  }

  test("streaming simhash: exact hamming pairs carry across micro-batches; cap bounds state") {
    import org.apache.spark.sql.streaming.TestGroupState
    def st(docs: List[(Long, Long)]) = TestGroupState.create[FpBucketState](
      optionalState = org.apache.spark.api.java.Optional.of(FpBucketState(docs)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    // resident fp 0b111 vs arrival 0b110 → hamming 1 (emitted);
    // arrival 0xF0F0 → hamming > 3 vs both residents (suppressed)
    val state = st(List((1L, 7L)))
    val out = simhashGroup("b", Iterator(
        BlockedFp("b", 2L, 6L), BlockedFp("b", 3L, 0xF0F0L)),
      state, maxHamming = 3, maxBucket = 10, ttlMs = 0L).toList
    assert(out == List(SimhashPair(1L, 2L, 1L)), out.toString)
    assert(state.get.docs.map(_._1).toSet == Set(1L, 2L, 3L))
    // at cap: nothing pairs, nothing stored
    val full = st(List((3L, 7L), (2L, 7L), (1L, 7L)))
    val capped = simhashGroup("b", Iterator(BlockedFp("b", 9L, 7L)),
      full, maxHamming = 3, maxBucket = 3, ttlMs = 0L).toList
    assert(capped.isEmpty && full.get.docs.length == 3)
  }

  test("streaming simhash batch-drive equals the batch blocked join") {
    val s = spark
    import s.implicits._
    val docs = (1L to 40L).map { i =>
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      (i, if (i % 5 == 0) base else s"$base doc$i word${i % 11} extra${i % 7}")
    }.toDF("doc_id", "text")
    val batch = graft.operators.Dedup.simhashPairs63(docs, "doc_id", "text", n = 3, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = streamingSimhashCandidates(docs, "doc_id", "text",
        n = 3, maxHamming = 3, maxBucket = Int.MaxValue)
      .collect().map(p => (p.da, p.db, p.hamming)).toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(batch.nonEmpty, "test corpus produced no near-dups")
  }

  test("candidate-bucket TTL expiry removes state and emits nothing") {
    import org.apache.spark.sql.streaming.TestGroupState
    def timedOut[S](s: S) = TestGroupState.create[S](
      optionalState = org.apache.spark.api.java.Optional.of(s),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 99999L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = true)
    val nd = timedOut(BucketState(List(1L, 2L)))
    assert(nearDupGroup("b", Iterator(BandedDoc("b", 9L)), nd, 10, 60000L).isEmpty)
    assert(nd.isRemoved)
    val sh = timedOut(FpBucketState(List((1L, 7L))))
    assert(simhashGroup("b", Iterator(BlockedFp("b", 9L, 7L)), sh, 3, 10, 60000L).isEmpty)
    assert(sh.isRemoved)
  }

  test("near-dup bucket cap: boilerplate buckets stop pairing and stop growing") {
    import org.apache.spark.sql.streaming.TestGroupState
    def st(ids: List[Long]) = TestGroupState.create[BucketState](
      optionalState = org.apache.spark.api.java.Optional.of(BucketState(ids)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    // bucket at cap (3): a new arrival emits nothing and is not stored
    val full = st(List(3L, 2L, 1L))
    val out = nearDupGroup("b", Iterator(BandedDoc("b", 9L)), full, maxBucket = 3, ttlMs = 0L)
    assert(out.isEmpty)
    assert(full.get == BucketState(List(3L, 2L, 1L)))
    // below cap: arrival pairs with every resident, normalized da < db
    val open = st(List(5L))
    val out2 = nearDupGroup("b", Iterator(BandedDoc("b", 2L)), open, maxBucket = 3, ttlMs = 0L).toList
    assert(out2 == List(CandidatePair(2L, 5L, "b")))
    assert(open.get.docIds.toSet == Set(2L, 5L))
  }

  test("semantic list transition: eps filter, zero-norm guard, cap") {
    import org.apache.spark.sql.streaming.TestGroupState
    def st(docs: List[(Long, Seq[Float], Double)]) = TestGroupState.create[ListState](
      optionalState = org.apache.spark.api.java.Optional.of(ListState(docs)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    // resident (1,0): arrival (1,0.1) → cos ~0.995 (emitted);
    // arrival (0,1) → cos 0 (suppressed); zero vector → never pairs
    // AND never becomes a resident (it would burn a maxList slot
    // forever while being unable to pair with anything)
    val state = st(List((1L, Seq(1f, 0f), 1.0)))
    val out = semGroup(0, Iterator(
        ListedVec(0, 2L, Seq(1f, 0.1f)), ListedVec(0, 3L, Seq(0f, 1f)),
        ListedVec(0, 4L, Seq(0f, 0f))),
      state, eps = 0.5, maxList = 10, ttlMs = 0L).toList
    assert(out.map(p => (p.da, p.db)) == List((1L, 2L)), out.toString)
    assert(out.head.cos > 0.99)
    assert(state.get.docs.map(_._1).toSet == Set(1L, 2L, 3L))
    // at cap: nothing pairs, nothing stored
    val full = st(List((3L, Seq(1f, 0f), 1.0), (2L, Seq(1f, 0f), 1.0), (1L, Seq(1f, 0f), 1.0)))
    val capped = semGroup(0, Iterator(ListedVec(0, 9L, Seq(1f, 0f))),
      full, eps = 0.5, maxList = 3, ttlMs = 0L).toList
    assert(capped.isEmpty && full.get.docs.length == 3)
    // timed-out state is removed and emits nothing
    val timed = TestGroupState.create[ListState](
      optionalState = org.apache.spark.api.java.Optional.of(ListState(List((1L, Seq(1f, 0f), 1.0)))),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 99999L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = true)
    assert(semGroup(0, Iterator(ListedVec(0, 9L, Seq(1f, 0f))), timed, 0.5, 10, 60000L).isEmpty)
    assert(timed.isRemoved)
  }

  test("streaming top-k: snapshots across batches, displacement, k-bound") {
    import org.apache.spark.sql.streaming.TestGroupState
    def st(pairs: List[(Long, Long)]) = TestGroupState.create[TopKState](
      optionalState = org.apache.spark.api.java.Optional.of(TopKState(pairs)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    // batch 1 established top-3 (9,1)(7,2)(5,3); batch 2 brings an 8
    // that displaces the 5, and a 1 that changes nothing
    val state = st(List((9L, 1L), (7L, 2L), (5L, 3L)))
    val out = topKGroup("src", Iterator(
        KeyedOrd("src", 8L, 9L), KeyedOrd("src", 1L, 8L)),
      state, k = 3).toList
    assert(out == List(TopKRow("src", 9L, 1L), TopKRow("src", 8L, 9L), TopKRow("src", 7L, 2L)),
      out.toString)
    assert(state.get.pairs == List((9L, 1L), (8L, 9L), (7L, 2L)))
  }

  test("streaming top-k: re-delivered id updates its slot, never double-counts; TTL expires") {
    import org.apache.spark.sql.streaming.TestGroupState
    def st(pairs: List[(Long, Long)], timedOut: Boolean = false) =
      TestGroupState.create[TopKState](
        optionalState = org.apache.spark.api.java.Optional.of(TopKState(pairs)),
        timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
        batchProcessingTimeMs = 1000L,
        eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
        hasTimedOut = timedOut)
    // id 2 re-delivered with a WORSE ord: must not evict the distinct
    // id 3 from the k=3 board (the at-least-once double-count bug)
    val s1 = st(List((9L, 1L), (7L, 2L), (5L, 3L)))
    val out1 = topKGroup("src", Iterator(KeyedOrd("src", 6L, 2L)), s1, k = 3, ttlMs = 60000L).toList
    assert(out1 == List(TopKRow("src", 9L, 1L), TopKRow("src", 7L, 2L), TopKRow("src", 5L, 3L)),
      out1.toString)
    // id 2 re-delivered BETTER: updates its own entry in place
    val s2 = st(List((9L, 1L), (7L, 2L), (5L, 3L)))
    val out2 = topKGroup("src", Iterator(KeyedOrd("src", 11L, 2L)), s2, k = 3, ttlMs = 60000L).toList
    assert(out2 == List(TopKRow("src", 11L, 2L), TopKRow("src", 9L, 1L), TopKRow("src", 5L, 3L)),
      out2.toString)
    // same id twice WITHIN a batch occupies one slot
    val s3 = st(Nil)
    val out3 = topKGroup("src", Iterator(
        KeyedOrd("src", 4L, 7L), KeyedOrd("src", 8L, 7L), KeyedOrd("src", 2L, 5L)),
      s3, k = 2, ttlMs = 60000L).toList
    assert(out3 == List(TopKRow("src", 8L, 7L), TopKRow("src", 2L, 5L)), out3.toString)
    // timed-out key: state removed, nothing emitted
    val timed = st(List((9L, 1L)), timedOut = true)
    assert(topKGroup("src", Iterator(KeyedOrd("src", 3L, 4L)), timed, k = 3, ttlMs = 60000L).isEmpty)
    assert(timed.isRemoved)
    // live path re-arms the timeout
    assert(s1.getTimeoutTimestampMs.isPresent)
  }

  test("streaming top-k batch-drive equals the batch capPerGroup") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (1L to 300L).map(i => (s"src${i % 5}", i, (i * 31) % 97))
      .toDF("src", "id", "score")
    val batch = graft.operators.Sampling.capPerGroup(rows, "src", col("score"), "id", k = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = streamingTopK(rows, "src", col("score"), "id", k = 7)
      .collect().map(r => (r.key, r.id, r.ord)).toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("streaming semantic batch-drive equals the batch eps-graph") {
    val s = spark
    import s.implicits._
    // deterministic 4-d vectors; every 5th doc shares one boilerplate
    // direction (a dense near-dup cluster), the rest spread out
    val docs = (1L to 60L).map { i =>
      val v =
        if (i % 5 == 0) Seq(1f, 0.01f * (i % 3), 0f, 0f)
        else Seq((i % 7).toFloat, (i % 11).toFloat, (i % 13).toFloat, 1f)
      (i, v)
    }.toDF("vec_id", "embedding")
    val batch = graft.operators.Dedup.semanticPairs(docs, "vec_id", "embedding",
        eps = 0.4, nList = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = graft.operators.Similarity.ivfCentroids(
      docs, "vec_id", "embedding", nList = 4, iters = 2)
    val streamed = streamingSemanticCandidates(docs, "vec_id", "embedding", cents, eps = 0.4)
      .collect().map(p => (p.da, p.db)).toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(batch.nonEmpty, "test corpus produced no semantic near-dups")
  }

  test("streaming KMV: cross-batch accumulation, redelivery idempotence, TTL") {
    import org.apache.spark.sql.streaming.TestGroupState
    def st(hashes: List[Long], timedOut: Boolean = false) =
      TestGroupState.create[KmvState](
        optionalState =
          if (hashes.isEmpty) org.apache.spark.api.java.Optional.empty()
          else org.apache.spark.api.java.Optional.of(KmvState(hashes)),
        timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
        batchProcessingTimeMs = 1000L,
        eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
        hasTimedOut = timedOut)
    // batch 2 merges into batch 1's sketch; only the k smallest survive
    val s1 = st(List(10L, 20L, 30L))
    val out1 = kmvGroup("g", Iterator(KeyedHash("g", 5L), KeyedHash("g", 25L)),
      s1, k = 4, ttlMs = 60000L).toList
    assert(s1.get.hashes == List(5L, 10L, 20L, 25L))
    assert(out1 == List(KmvSnapshot("g", 4L, 25L, (BigInt(3) *
      (BigInt(1000000007L) * 1000000009L) / 25L).toLong)))
    // re-delivered hash is set-idempotent: sketch unchanged
    val s2 = st(List(5L, 10L, 20L, 25L))
    val out2 = kmvGroup("g", Iterator(KeyedHash("g", 10L)), s2, k = 4, ttlMs = 60000L).toList
    assert(s2.get.hashes == List(5L, 10L, 20L, 25L) && out2.head.nKept == 4L)
    // below k the estimate is the exact count
    val s3 = st(Nil)
    val out3 = kmvGroup("g", Iterator(KeyedHash("g", 7L), KeyedHash("g", 3L)),
      s3, k = 4, ttlMs = 0L).toList
    assert(out3 == List(KmvSnapshot("g", 2L, 7L, 2L)))
    // timed-out key: removed, silent
    val timed = st(List(1L), timedOut = true)
    assert(kmvGroup("g", Iterator(KeyedHash("g", 2L)), timed, k = 4, ttlMs = 60000L).isEmpty)
    assert(timed.isRemoved)
    assert(s1.getTimeoutTimestampMs.isPresent)
  }

  test("streaming KMV over a real stream: each batch snapshots the union-so-far") {
    implicit val sqlCtx = spark.sqlContext
    val s = spark
    import s.implicits._
    val input = MemoryStream[(String, Long)]
    val query = streamingDistinctKmv(
        input.toDS().toDF("g", "v"), "g", "v", k = 64)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode("append").start()
    input.addData((1L to 100L).map(v => ("g", v)): _*)
    query.processAllAvailable()
    // batch 2 overlaps batch 1 — the sketch must reflect the DISTINCT
    // union, exactly the batch operator over each prefix
    input.addData((50L to 150L).map(v => ("g", v)): _*)
    query.processAllAvailable()
    query.stop()
    def batchSnap(hi: Long) = graft.operators.Profile.distinctKmv(
        (1L to hi).map(v => ("g", v)).toDF("g", "v"), Seq("g"), "v", k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).head
    val got = spark.table("kmv_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(batchSnap(100L), batchSnap(150L)), got.toString)
  }

  test("streaming KMV batch-drive equals the batch distinctKmv") {
    val s = spark
    import s.implicits._
    val rows = (1L to 5000L).map(i => (s"g${i % 4}", i % 700)).toDF("g", "v")
    val batch = graft.operators.Profile.distinctKmv(rows, Seq("g"), "v", k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val streamed = streamingDistinctKmv(rows, "g", "v", k = 64)
      .collect().map(r => (r.key, r.nKept, r.kthHash, r.estDistinct)).toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    // 700 distinct values spread over 4 groups -> every group saturates
    assert(batch.forall(_._2 == 64L))
  }

  test("streaming revisit resolution: resolve-on-arrival, out-of-order buffering, keep-first keeper") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RevisitEvent]
    val q = streamingResolveRevisits(input.toDS())
      .writeStream.format("memory").queryName("revisit_out")
      .outputMode("append").start()
    // batch 1: d1 original + a same-batch revisit (resolves now);
    // d2 gets a revisit BEFORE any original (buffers); d3 dangles
    input.addData(
      RevisitEvent("d1", isOriginal = true, 10L, "/p/1", "body-1"),
      RevisitEvent("d1", isOriginal = false, 20L, "/r/1", ""),
      RevisitEvent("d2", isOriginal = false, 30L, "/r/2", ""),
      RevisitEvent("d3", isOriginal = false, 40L, "/r/3", ""))
    q.processAllAvailable()
    // batch 2: d2's original arrives -> the buffered revisit resolves;
    // a LATER smaller-id original for d1 must NOT replace the keeper
    input.addData(
      RevisitEvent("d2", isOriginal = true, 5L, "/p/2", "body-2"),
      RevisitEvent("d1", isOriginal = true, 1L, "/p/1b", "body-1b"),
      RevisitEvent("d1", isOriginal = false, 50L, "/r/1b", ""))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("revisit_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    assert(rows.toList == List(
      ("d1", 20L, "/r/1", 10L, "body-1"),
      ("d1", 50L, "/r/1b", 10L, "body-1"), // first-arrival keeper, not id 1
      ("d2", 30L, "/r/2", 5L, "body-2")))  // buffered, resolved on arrival
    // d3 never emitted: dangling revisits stay in state
  }

  test("revisit transition: keep-first within a batch is smallest doc_id; pendingMax bounds state deterministically") {
    import org.apache.spark.sql.streaming.TestGroupState
    def st() = TestGroupState.create[OrigState](
      optionalState = org.apache.spark.api.java.Optional.empty(),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs =
        org.apache.spark.api.java.Optional.empty(), hasTimedOut = false)
    // two originals in ONE batch: the smaller doc_id wins (batch rule)
    val s1 = st()
    val out1 = revisitGroup("d", Iterator(
      RevisitEvent("d", isOriginal = true, 9L, "/b", "B"),
      RevisitEvent("d", isOriginal = true, 3L, "/a", "A"),
      RevisitEvent("d", isOriginal = false, 7L, "/r", "")),
      s1, pendingMax = 10, ttlMs = 0L).toList
    assert(out1 == List(ResolvedRevisit("d", 7L, "/r", 3L, "A")))
    assert(s1.get.origDocId == 3L)
    // pendingMax: smallest doc_ids stay, overflow counted
    val s2 = st()
    val out2 = revisitGroup("d", Iterator(
      RevisitEvent("d", isOriginal = false, 5L, "/r5", ""),
      RevisitEvent("d", isOriginal = false, 1L, "/r1", ""),
      RevisitEvent("d", isOriginal = false, 9L, "/r9", "")),
      s2, pendingMax = 2, ttlMs = 0L).toList
    assert(out2.isEmpty)
    assert(s2.get.pending.map(_._1) == List(1L, 5L) && s2.get.dropped == 1L)
  }
}
