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
}
