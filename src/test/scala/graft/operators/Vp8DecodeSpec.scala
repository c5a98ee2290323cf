package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** VP8 keyframe decode vs the SYSTEM libwebp decoder: every golden in
  * [[Vp8Golden]] (encoded by the system encoder across the keyframe
  * feature space — quality sweep, loop filter off/normal/simple/auto,
  * sharpness, segments, multi-partition, non-MB-aligned sizes) must
  * reproduce the system decoder's Y/U/V planes BYTE FOR BYTE — VP8
  * reconstruction is exact integer arithmetic, so conformant decoders
  * agree exactly and any wrong table byte or filter threshold
  * desynchronizes visibly. Structural rejects must return None, never
  * throw.
  */
class Vp8DecodeSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def firstDiff(got: Array[Byte], want: Array[Byte], w: Int): String = {
    val i = got.zip(want).indexWhere { case (a, b) => a != b }
    if (i < 0) s"length ${got.length} vs ${want.length}"
    else s"at ($i = row ${i / w}, col ${i % w}): got ${got(i) & 0xff} want ${want(i) & 0xff}"
  }

  for (g <- Vp8Golden.all) {
    test(s"golden ${g.name}: Y/U/V planes match the system decoder byte-for-byte") {
      val out = Vp8Decode.vp8Yuv(hex(g.webpHex))
      assert(out.isDefined, s"${g.name} failed to decode")
      val yuv = out.get
      assert(yuv.w == g.w && yuv.h == g.h, s"dims ${yuv.w}x${yuv.h} want ${g.w}x${g.h}")
      val (ey, eu, ev) = (hex(g.yHex), hex(g.uHex), hex(g.vHex))
      val cw = (g.w + 1) / 2
      assert(java.util.Arrays.equals(yuv.y, ey),
        s"${g.name} Y " + firstDiff(yuv.y, ey, g.w))
      assert(java.util.Arrays.equals(yuv.u, eu),
        s"${g.name} U " + firstDiff(yuv.u, eu, cw))
      assert(java.util.Arrays.equals(yuv.v, ev),
        s"${g.name} V " + firstDiff(yuv.v, ev, cw))
    }
  }

  test("every golden decodes through the corpus-facing imagePixels path with right dims") {
    for (g <- Vp8Golden.all) {
      val px = MediaDecode.imagePixels(hex(g.webpHex))
      assert(px.isDefined, s"${g.name} not decodable via imagePixels")
      assert(px.get.width == g.w && px.get.height == g.h && px.get.channels == 3, g.name)
    }
  }

  test("vp8Pixels: RGB output has the right shape and tracks the Y plane") {
    val g = Vp8Golden.all.find(_.name == "lf_defaults").get
    val px = Vp8Decode.vp8Pixels(hex(g.webpHex)).get
    assert(px.width == g.w && px.height == g.h && px.channels == 3)
    // grey-ish pixels must decode to grey-ish RGB: probe the studio-
    // swing inverse on the known Y/U/V of a pixel
    val yuv = Vp8Decode.vp8Yuv(hex(g.webpHex)).get
    val y0 = yuv.y(0) & 0xff
    val r0 = px.data(0) & 0xff
    assert(math.abs(r0 - ((298 * (y0 - 16) + 409 * ((yuv.v(0) & 0xff) - 128) + 128) >> 8).max(0).min(255)) == 0)
  }

  test("structural rejects: None, never a throw") {
    val good = hex(Vp8Golden.all.head.webpHex)
    assert(Vp8Decode.vp8Yuv(Array[Byte]()).isEmpty)
    assert(Vp8Decode.vp8Yuv("RIFFxxxxWEBP".getBytes).isEmpty)
    // every truncation prefix of a real file: None or a valid decode
    // of a prefix-complete stream — never an exception
    (0 until good.length).foreach { n =>
      Vp8Decode.vp8Yuv(good.take(n)) // must not throw
    }
    // lossless VP8L content is NOT this decoder's: None
    val vp8l = Vp8lGolden.all.head
    assert(Vp8Decode.vp8Yuv(hex(vp8l.webpHex)).isEmpty)
    // non-keyframe tag (low bit set in frame tag) rejects
    val interTag = good.clone()
    interTag(20) = (interTag(20) | 1).toByte // frame tag low byte inside VP8 chunk
    assert(Vp8Decode.vp8Yuv(interTag).isEmpty)
    // bad sync code rejects
    val badSync = good.clone()
    badSync(23) = 0x00
    assert(Vp8Decode.vp8Yuv(badSync).isEmpty)
    // pixel cap binds before allocation (1x1 fits maxPixels = 1; a
    // real image doesn't)
    assert(Vp8Decode.vp8Yuv(good, maxPixels = 1L).isDefined)
    val big = hex(Vp8Golden.all.find(_.name == "lf_defaults").get.webpHex)
    assert(Vp8Decode.vp8Yuv(big, maxPixels = 1L).isEmpty)
    assert(Vp8Decode.vp8Yuv(big).isDefined)
  }

  test("bit-corruption fuzz: random flips never throw") {
    val rnd = new scala.util.Random(0xBEEF)
    val base = hex(Vp8Golden.all.find(_.name == "lf_edges").get.webpHex)
    for (_ <- 0 until 2000) {
      val b = base.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 0 until flips) {
        val i = rnd.nextInt(b.length)
        b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      Vp8Decode.vp8Yuv(b) // any outcome but a throw
    }
  }
}
