package graft.operators

import graft.SparkSpec
import Multimodal._

class MultimodalDecodeSpec extends SparkSpec {

  test("partition-batched decode: one codec per partition, schema and metadata contract hold") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image", "abcdef".getBytes),
      MediaRow(2L, "audio", "0123456789".getBytes),
      MediaRow(3L, "video", Array.fill[Byte](100)(7))).toDS().repartition(2)

    val decoded = decodePartitions(media).collect().sortBy(_.doc_id)

    assert(decoded.map(_.doc_id).toList == List(1L, 2L, 3L))
    val img = decoded(0)
    assert(img.n_bytes == 6 && img.width == (6 % 64 + 1) * 16 &&
      img.height == (6 % 48 + 1) * 16 && img.duration_ms == 0)
    val audio = decoded(1)
    assert(audio.width == 0 && audio.duration_ms == 10 * 40)
    assert(decoded.forall(_.features.length == 8))
    // deterministic: same bytes → same features
    val again = decodePartitions(media).collect().sortBy(_.doc_id)
    assert(again.map(_.features.toList).toList == decoded.map(_.features.toList).toList)
  }

  test("codec is initialized per partition, not per row") {
    import spark.implicits._
    val counterAccum = spark.sparkContext.longAccumulator("codec_inits")
    val media = Seq.tabulate(20)(i => MediaRow(i.toLong, "audio", Array[Byte](i.toByte)))
      .toDS().repartition(4)
    decodePartitions(media, () => { counterAccum.add(1); new StubCodec(4) }).count()
    assert(counterAccum.value == 4L, s"expected 4 codec inits, got ${counterAccum.value}")
  }

  test("fakeFeatures (expression path) mirrors StubCodec byte-for-byte, high bytes included") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // bytes >= 0x80 are exactly what a string decode would U+FFFD-mangle
    val bytes = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0xff.toByte, 0x00, 0xe0.toByte)
    val expr = Seq(Tuple1(bytes)).toDF("content")
      .select(fakeFeatures(col("content"), 8).as("f"))
      .head().getSeq[Float](0).toList
    val codec = new StubCodec(8)
      .decode(Iterator.single(MediaRow(1L, "image", bytes))).next().features.toList
    assert(expr == codec, s"expression $expr != codec $codec")
  }

  test("codec closes exactly once, including when the iterator is not drained") {
    import spark.implicits._
    val media = (1L to 40L).map(i => MediaRow(i, "image", Array[Byte](i.toByte)))
      .toDS().repartition(2)
    MultimodalDecodeSpec.closeCount.set(0)
    class CountingCodec extends MediaCodec {
      private val inner = new StubCodec(4)
      def decode(rows: Iterator[MediaRow]): Iterator[DecodedRow] = inner.decode(rows)
      override def close(): Unit = MultimodalDecodeSpec.closeCount.incrementAndGet()
    }
    // undrained: limit() stops pulling early — the task-completion
    // listener must still close each partition's codec exactly once
    decodePartitions(media, () => new CountingCodec).limit(3).collect()
    // both partitions' tasks ran (limit plans a local limit per
    // partition before the global one), each closes its codec once
    assert(MultimodalDecodeSpec.closeCount.get() >= 1 &&
      MultimodalDecodeSpec.closeCount.get() <= 2,
      s"close count ${MultimodalDecodeSpec.closeCount.get()}")
    MultimodalDecodeSpec.closeCount.set(0)
    // drained: exhaustion hook + completion listener must still sum to
    // exactly one close per partition
    val ds = decodePartitions(media, () => new CountingCodec)
    ds.collect()
    assert(MultimodalDecodeSpec.closeCount.get() == 2,
      s"close count ${MultimodalDecodeSpec.closeCount.get()} (want 2: once per partition)")
  }

  test("decodePartitions drives as a readStream transform (stream equals batch)") {
    // mapPartitions is streaming-legal: the binary-decode stage drops
    // into an ingest stream unchanged — the multimodal twin of the
    // frozen-model serving drives in TopicsSpec/CurationServingSpec
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "image", "abcdef".getBytes),
      MediaRow(2L, "audio", "0123456789".getBytes),
      MediaRow(3L, "video", Array.fill[Byte](100)(7)))
    val dir = java.nio.file.Files.createTempDirectory("graft-mm-stream").toString
    rows.toDS().write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(rows.toDS().schema).parquet(s"$dir/in").as[MediaRow]
    val q = decodePartitions(stream, () => new Multimodal.HeaderCodec(4))
      .writeStream.format("memory").queryName("mm_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    def key(r: DecodedRow) = (r.doc_id, r.n_bytes, r.width, r.height,
      r.duration_ms, r.features.toList)
    val streamed = spark.table("mm_stream").as[DecodedRow].collect().map(key).toSet
    val batch = decodePartitions(rows.toDS(), () => new Multimodal.HeaderCodec(4))
      .collect().map(key).toSet
    assert(streamed == batch && streamed.size == 3)
  }

  test("audioWindows and imageTiles drive as readStream transforms (stream equals batch)") {
    import spark.implicits._
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // the mm_pixel_stats PCM16 WAV (4 samples) and 24bpp BMP fixtures
    val rows = Seq(
      MediaRow(1L, "audio", hex("52494646" + "2C000000" + "57415645" +
        "666D7420" + "10000000" + "0100" + "0100" + "401F0000" + "803E0000" + "0200" + "1000" +
        "64617461" + "08000000" + "E803" + "30F8" + "B80B" + "0080")),
      MediaRow(2L, "image", hex("424D" + "46000000" + "00000000" + "36000000" +
        "28000000" + "02000000" + "02000000" + "0100" + "1800" + "00000000" +
        "10000000" + "00000000" + "00000000" + "00000000" + "00000000" +
        "FF0000" + "3264C8" + "0000" + "0000FF" + "00FF00" + "0000")),
      MediaRow(3L, "image", "not media".getBytes)) // undecodable → no rows
    val dir = java.nio.file.Files.createTempDirectory("graft-mm-win-stream").toString
    rows.toDS().write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(rows.toDS().schema).parquet(s"$dir/in").as[MediaRow]
    val qa = audioWindows(stream, 3)
      .writeStream.format("memory").queryName("mm_aw_stream").outputMode("append").start()
    try qa.processAllAvailable() finally qa.stop()
    val qi = imageTiles(stream, 4)
      .writeStream.format("memory").queryName("mm_it_stream").outputMode("append").start()
    try qi.processAllAvailable() finally qi.stop()
    val aw = spark.table("mm_aw_stream").as[AudioWindowRow].collect().toSet
    val it = spark.table("mm_it_stream").as[ImageTileRow].collect().toSet
    assert(aw == audioWindows(rows.toDS(), 3).collect().toSet && aw.size == 2)
    assert(it == imageTiles(rows.toDS(), 4).collect().toSet && it.size == 1)
    // window math spot-check: samples 1000,-2000,3000 | -32768
    val w0 = aw.find(_.win_idx == 0).get
    assert(w0.zcr == 2 && w0.sum_sq == 1000L * 1000 + 2000L * 2000 + 3000L * 3000)
    assert(aw.find(_.win_idx == 1).get.n_samples == 1)
  }

  test("imageHashes and audioHashes drive as readStream transforms (stream equals batch)") {
    // the multimodal-fingerprint serving chain: map-only decode+hash,
    // so a curation pipeline can fingerprint NEW media incrementally
    // and join against the batch corpus index — parity pins that the
    // streaming plan computes the identical 63-bit hashes (r13,
    // VERDICT r12 #7). The image row is a LOSSY WebP golden, so the
    // VP8 keyframe decoder also rides the streaming path.
    import spark.implicits._
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val webp = hex(Vp8Golden.all.find(_.name == "lf_defaults").get.webpHex)
    // PCM16 mono WAV with 128 samples (audioHash63 needs >= 64)
    val n = 128
    val pcm = (0 until n).flatMap { i =>
      val s = ((i * 997 + 13) % 4001 - 2000).toShort
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
    }.toArray
    def le32(v: Int) = Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)
    val wav = "RIFF".getBytes ++ le32(36 + 2 * n) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ Array[Byte](1, 0, 1, 0) ++ le32(8000) ++
      le32(16000) ++ Array[Byte](2, 0, 16, 0) ++
      "data".getBytes ++ le32(2 * n) ++ pcm
    val rows = Seq(
      MediaRow(1L, "image", webp),
      MediaRow(2L, "audio", wav),
      MediaRow(3L, "image", "not media".getBytes)) // undecodable → no rows
    val dir = java.nio.file.Files.createTempDirectory("graft-mm-hash-stream").toString
    rows.toDS().write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(rows.toDS().schema).parquet(s"$dir/in").as[MediaRow]
    val qi = imageHashes(stream)
      .writeStream.format("memory").queryName("mm_ih_stream").outputMode("append").start()
    try qi.processAllAvailable() finally qi.stop()
    val qa = audioHashes(stream)
      .writeStream.format("memory").queryName("mm_ah_stream").outputMode("append").start()
    try qa.processAllAvailable() finally qa.stop()
    val ih = spark.table("mm_ih_stream").as[ImageHashRow].collect().toSet
    val ah = spark.table("mm_ah_stream").as[AudioHashRow].collect().toSet
    assert(ih == imageHashes(rows.toDS()).collect().toSet && ih.size == 1)
    assert(ah == audioHashes(rows.toDS()).collect().toSet && ah.size == 1)
    assert(ih.head.doc_id == 1L && ah.head.doc_id == 2L)
  }

  test("warcRecords/warcResponses consume .warc.gz identically to plain WARC") {
    // the production CommonCrawl layout is one gzip member per record;
    // the operators must parse it transparently with the same record
    // maps (offsets into the decompressed stream) and the same bodies.
    import spark.implicits._
    val html = "<p>hello crawl</p>"
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html"
    val rec0 = "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
    val rec1 = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://a.com/x\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n$http\r\n\r\n"
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)); g.close()
      bos.toByteArray
    }
    val plainRow = MediaRow(1L, "warc",
      (rec0 + rec1).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val gzRow = MediaRow(2L, "warc", gz(rec0) ++ gz(rec1)) // member per record
    val badRow = MediaRow(3L, "warc", gz(rec0).dropRight(2)) // truncated → no rows
    val ds = Seq(plainRow, gzRow, badRow).toDS()
    val recs = warcRecords(ds).collect().groupBy(_.doc_id)
    assert(recs.keySet == Set(1L, 2L))
    assert(recs(1L).map(r => r.copy(doc_id = 0)).toSet ==
      recs(2L).map(r => r.copy(doc_id = 0)).toSet)
    val resp = warcResponses(ds).collect().groupBy(_.doc_id)
    assert(resp(1L).head.body == html && resp(2L).head.body == html)
    assert(resp(2L).head.target_uri == "http://a.com/x")
  }
}

object MultimodalDecodeSpec {
  val closeCount = new java.util.concurrent.atomic.AtomicInteger(0)
}
