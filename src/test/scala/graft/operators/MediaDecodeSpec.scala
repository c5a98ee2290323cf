package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM pixel/sample decode: BMP 24 bpp row/padding/orientation
  * handling, the full PNG filter matrix (round-trip against an
  * independent forward-filter implementation), WAV PCM16 extraction,
  * and every unsupported-shape None path.
  */
class MediaDecodeSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def le(v: Long, n: Int): String =
    (0 until n).map(i => "%02X".format((v >> (8 * i)) & 0xff)).mkString
  private def be(v: Long, n: Int): String =
    (0 until n).reverse.map(i => "%02X".format((v >> (8 * i)) & 0xff)).mkString

  // ---- BMP ---------------------------------------------------------

  /** 2×2 24 bpp BMP: rows stored BGR bottom-up with 2 pad bytes. */
  private def bmp2x2(topDown: Boolean): Array[Byte] = {
    val h = if (topDown) -2L & 0xFFFFFFFFL else 2L
    // logical image: (0,0)=red (0,1)=green / (1,0)=blue (1,1)=white
    val rowTop = "0000FF" + "00FF00" + "0000"    // BGR red, green + pad
    val rowBot = "FF0000" + "FFFFFF" + "0000"    // BGR blue, white + pad
    val rows = if (topDown) rowTop + rowBot else rowBot + rowTop
    hex("424D" + le(54 + 16, 4) + "00000000" + le(54, 4) +
      le(40, 4) + le(2, 4) + le(h, 4) + "0100" + "1800" + le(0, 4) +
      le(16, 4) + "00000000" + "00000000" + "00000000" + "00000000" + rows)
  }

  test("BMP: bottom-up and top-down 24bpp decode to identical RGB pixels") {
    for (td <- Seq(false, true)) {
      val img = MediaDecode.bmpPixels(bmp2x2(td)).get
      assert(img.width == 2 && img.height == 2 && img.channels == 3)
      val px = img.data.map(_ & 0xff).grouped(3).map(_.toList).toList
      assert(px == List(
        List(255, 0, 0), List(0, 255, 0),   // top row: red, green
        List(0, 0, 255), List(255, 255, 255)), s"topDown=$td got $px")
    }
    // imagePixels dispatches to the BMP path
    assert(MediaDecode.imagePixels(bmp2x2(false)).isDefined)
  }

  test("BMP: 8bpp palette and 32bpp BGRX decode to RGB") {
    // 2×1 8bpp: 3-color table (biClrUsed = 3), indices 2, 0; row pads to 4
    val p8 = hex("424D" + le(54 + 12 + 4, 4) + "00000000" + le(54 + 12, 4) +
      le(40, 4) + le(2, 4) + le(1, 4) + "0100" + "0800" + le(0, 4) +
      le(4, 4) + "00000000" + "00000000" + le(3, 4) + "00000000" +
      "FF000000" + "00FF0000" + "0000FF00" +       // B,G,R,x quads: blue, green, red
      "02000000")                                  // indices 2, 0 + pad
    val img8 = MediaDecode.bmpPixels(p8).get
    assert(img8.data.map(_ & 0xff).toSeq == Seq(255, 0, 0, 0, 0, 255)) // red, blue
    // index past the 3-entry table → None
    val over = p8.clone(); over(66) = 3
    assert(MediaDecode.bmpPixels(over).isEmpty)
    // 1×2 32bpp BGRX bottom-up: no padding needed, 4th byte dropped
    val p32 = hex("424D" + le(54 + 8, 4) + "00000000" + le(54, 4) +
      le(40, 4) + le(1, 4) + le(2, 4) + "0100" + "2000" + le(0, 4) +
      le(8, 4) + "00000000" + "00000000" + "00000000" + "00000000" +
      "4080C0FF" + "0A141EFF")                     // bottom row then top row
    val img32 = MediaDecode.bmpPixels(p32).get
    assert(img32.data.map(_ & 0xff).toSeq == Seq(30, 20, 10, 192, 128, 64))
  }

  test("BMP: unsupported shapes return None") {
    val good = bmp2x2(false)
    assert(MediaDecode.bmpPixels(good.take(40)).isEmpty)     // truncated
    val bpp8 = good.clone(); bpp8(28) = 8                    // 8 bpp
    assert(MediaDecode.bmpPixels(bpp8).isEmpty)
    val rle = good.clone(); rle(30) = 1                      // compressed
    assert(MediaDecode.bmpPixels(rle).isEmpty)
    assert(MediaDecode.bmpPixels(hex("DEADBEEF" + "00" * 60)).isEmpty)
  }

  // ---- PNG ---------------------------------------------------------

  /** forward filter (RFC 2083 §6.1) — the independent inverse of the
    * decoder's reversal, per row. */
  private def forwardFilter(filter: Int, row: Array[Int], prev: Array[Int], bpp: Int): Array[Int] =
    row.indices.map { x =>
      val a = if (x >= bpp) row(x - bpp) else 0
      val up = prev(x)
      val c = if (x >= bpp) prev(x - bpp) else 0
      val pred = filter match {
        case 0 => 0
        case 1 => a
        case 2 => up
        case 3 => (a + up) / 2
        case 4 =>
          val p = a + up - c
          val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
          if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
      }
      (row(x) - pred) & 0xff
    }.toArray

  /** assemble a PNG from raw pixels with the given per-row filters. */
  private def png(w: Int, h: Int, colorType: Int, channels: Int,
                  pixels: Array[Int], filters: Seq[Int],
                  interlace: Int = 0, bitDepth: Int = 8,
                  palette: Seq[(Int, Int, Int)] = Nil): Array[Byte] = {
    val stride = w * channels
    val filtered = new java.io.ByteArrayOutputStream()
    var prev = Array.fill(stride)(0)
    for (y <- 0 until h) {
      val row = pixels.slice(y * stride, (y + 1) * stride)
      filtered.write(filters(y))
      forwardFilter(filters(y), row, prev, channels).foreach(filtered.write)
      prev = row
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered.toByteArray); deflater.finish()
    val comp = new Array[Byte](filtered.size() + 64)
    val n = deflater.deflate(comp)
    deflater.end()
    def chunk(typ: String, payload: String): String =
      be(payload.length / 2, 4) +
        typ.getBytes("ISO-8859-1").map("%02X".format(_)).mkString +
        payload + "00000000" // CRC unchecked by the parser
    val ihdr = be(w, 4) + be(h, 4) + "%02X".format(bitDepth) +
      "%02X".format(colorType) + "0000" + "%02X".format(interlace)
    val idat = comp.take(n).map("%02X".format(_)).mkString
    val plte = if (palette.isEmpty) ""
      else chunk("PLTE", palette.map { case (r, g, bl) => f"$r%02X$g%02X$bl%02X" }.mkString)
    hex("89504E470D0A1A0A" + chunk("IHDR", ihdr) + plte + chunk("IDAT", idat) + chunk("IEND", ""))
  }

  test("PNG: every filter type round-trips (RGB)") {
    val w = 5; val h = 5; val ch = 3
    // deterministic pseudo-random pixels exercising all value ranges
    val pixels = Array.tabulate(w * h * ch)(i => (i * 73 + 11) % 256)
    val bytes = png(w, h, colorType = 2, channels = ch, pixels, filters = Seq(0, 1, 2, 3, 4))
    val img = MediaDecode.pngPixels(bytes).get
    assert(img.width == w && img.height == h && img.channels == ch)
    assert(img.data.map(_ & 0xff).toSeq == pixels.toSeq)
  }

  test("PNG: greyscale and RGBA decode; split IDAT chunks concatenate") {
    val grey = Array.tabulate(6)(i => i * 40)
    val g = MediaDecode.pngPixels(png(3, 2, 0, 1, grey, Seq(1, 4))).get
    assert(g.channels == 1 && g.data.map(_ & 0xff).toSeq == grey.toSeq)
    val rgba = Array.tabulate(2 * 2 * 4)(i => (i * 97 + 5) % 256)
    val a = MediaDecode.pngPixels(png(2, 2, 6, 4, rgba, Seq(3, 2))).get
    assert(a.channels == 4 && a.data.map(_ & 0xff).toSeq == rgba.toSeq)
    // split one IDAT into two chunks: decoder must concatenate
    val whole = png(3, 2, 0, 1, grey, Seq(0, 0))
    val ihdrEnd = 8 + 12 + 13
    val idatLen = ((whole(ihdrEnd) & 0xff) << 24) | ((whole(ihdrEnd + 1) & 0xff) << 16) |
      ((whole(ihdrEnd + 2) & 0xff) << 8) | (whole(ihdrEnd + 3) & 0xff)
    val payload = whole.slice(ihdrEnd + 8, ihdrEnd + 8 + idatLen)
    val (p1, p2) = payload.splitAt(3)
    def chunkB(typ: String, body: Array[Byte]): Array[Byte] =
      hex(be(body.length, 4)) ++ typ.getBytes("ISO-8859-1") ++ body ++ hex("00000000")
    val split = whole.take(ihdrEnd) ++ chunkB("IDAT", p1) ++ chunkB("IDAT", p2) ++
      chunkB("IEND", Array.emptyByteArray)
    assert(MediaDecode.pngPixels(split).get.data.map(_ & 0xff).toSeq == grey.toSeq)
  }

  test("PNG: palette resolves through PLTE; grey+alpha keeps 2 channels") {
    val idx = Array(0, 1, 2, 1, 0, 2)
    val pal = Seq((255, 0, 0), (0, 255, 0), (16, 32, 64))
    val px = MediaDecode.pngPixels(png(3, 2, 3, 1, idx, Seq(0, 1), palette = pal)).get
    assert(px.channels == 3)
    assert(px.data.map(_ & 0xff).toSeq ==
      idx.flatMap(i => Seq(pal(i)._1, pal(i)._2, pal(i)._3)).toSeq)
    // out-of-range index → None
    val over = MediaDecode.pngPixels(png(3, 2, 3, 1, Array(0, 1, 3, 1, 0, 2), Seq(0, 1), palette = pal))
    assert(over.isEmpty)
    val ga = Array.tabulate(2 * 2 * 2)(i => (i * 61 + 7) % 256)
    val g = MediaDecode.pngPixels(png(2, 2, 4, 2, ga, Seq(2, 4))).get
    assert(g.channels == 2 && g.data.map(_ & 0xff).toSeq == ga.toSeq)
    // grey+alpha meanLuma reads the GREY plane, never alpha
    assert(g.meanLuma == (ga(0) + ga(2) + ga(4) + ga(6)) / 4.0)
  }

  /** assemble an Adam7-interlaced PNG: pixels are re-ordered into the
    * seven passes and filtered WITHIN each pass (cycling filters), the
    * independent forward form of the decoder's per-pass unfilter. */
  private def pngAdam7(w: Int, h: Int, colorType: Int, channels: Int,
                       pixels: Array[Int]): Array[Byte] = {
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val filtered = new java.io.ByteArrayOutputStream()
    var rowIdx = 0
    for ((xs, ys, xst, yst) <- passes) {
      val pw = if (w > xs) (w - xs + xst - 1) / xst else 0
      val ph = if (h > ys) (h - ys + yst - 1) / yst else 0
      if (pw > 0 && ph > 0) {
        var prev = Array.fill(pw * channels)(0)
        for (j <- 0 until ph) {
          val row = (0 until pw).flatMap { i =>
            val y = ys + j * yst; val x = xs + i * xst
            (0 until channels).map(c => pixels((y * w + x) * channels + c))
          }.toArray
          val f = rowIdx % 5; rowIdx += 1
          filtered.write(f)
          forwardFilter(f, row, prev, channels).foreach(filtered.write)
          prev = row
        }
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered.toByteArray); deflater.finish()
    val comp = new Array[Byte](filtered.size() + 64)
    val n = deflater.deflate(comp); deflater.end()
    def chunk(typ: String, payload: String): String =
      be(payload.length / 2, 4) +
        typ.getBytes("ISO-8859-1").map("%02X".format(_)).mkString +
        payload + "00000000"
    val ihdr = be(w, 4) + be(h, 4) + "08" + "%02X".format(colorType) + "0000" + "01"
    hex("89504E470D0A1A0A" + chunk("IHDR", ihdr) +
      chunk("IDAT", comp.take(n).map("%02X".format(_)).mkString) + chunk("IEND", ""))
  }

  test("PNG: Adam7 interlace round-trips (all 7 passes, non-multiple-of-8 dims)") {
    for ((w, h, ct, ch) <- Seq((9, 10, 2, 3), (3, 3, 0, 1), (8, 8, 6, 4), (1, 1, 0, 1))) {
      val pixels = Array.tabulate(w * h * ch)(i => (i * 41 + 13) % 256)
      val img = MediaDecode.pngPixels(pngAdam7(w, h, ct, ch, pixels))
      assert(img.isDefined, s"$w x $h ct=$ct")
      assert(img.get.data.map(_ & 0xff).toSeq == pixels.toSeq, s"$w x $h ct=$ct")
    }
  }

  test("PNG: unsupported shapes return None, never throw") {
    val grey = Array.tabulate(6)(i => i * 40)
    assert(MediaDecode.pngPixels(png(3, 2, 0, 1, grey, Seq(0, 0), interlace = 2)).isEmpty)
    assert(MediaDecode.pngPixels(png(3, 2, 0, 1, grey, Seq(0, 0), bitDepth = 16)).isEmpty)
    assert(MediaDecode.pngPixels(png(3, 2, 3, 1, grey, Seq(0, 0))).isEmpty) // palette WITHOUT a PLTE
    // truncated IDAT: inflate cannot fill the scanlines
    val whole = png(3, 2, 0, 1, grey, Seq(0, 0))
    assert(MediaDecode.pngPixels(whole.take(whole.length - 20)).isEmpty)
    assert(MediaDecode.pngPixels(hex("89504E470D0A1A0A" + "00" * 20)).isEmpty)
  }

  test("PNG decompression bomb: huge claimed dims return None, no allocation") {
    // w and h each pass the per-dimension cap, but the product would be
    // a multi-TB buffer (and h*(1+stride) wraps Int): must refuse early
    val bomb = hex("89504E470D0A1A0A" +
      "0000000D" + "49484452" +                      // IHDR len 13
      "00100000" + "00100000" +                      // w = h = 2^20
      "08" + "02" + "0000" + "00" + "00000000" +     // 8-bit RGB, no interlace
      "00000001" + "49444154" + "00" + "00000000" +  // 1-byte IDAT
      "00000000" + "49454E44" + "00000000")          // IEND
    assert(MediaDecode.pngPixels(bomb).isEmpty)
  }

  test("WAV corrupt chunk sizes degrade to None, never negative-index") {
    val good = wavPcm(Seq(1, 2, 3))
    // data-chunk size field forced to 0xFFFFFFFF: the Long chunk walk
    // must step past the end instead of wrapping Int
    val bad = good.clone()
    val dataSizeOff = good.length - 3 * 2 - 4
    for (i <- 0 until 4) bad(dataSizeOff + i) = 0xff.toByte
    assert(MediaDecode.wavPcm16(bad).isEmpty)
    // fmt-chunk size near Int.MaxValue
    val bad2 = good.clone()
    bad2(16) = 0xf0.toByte; bad2(17) = 0xff.toByte; bad2(18) = 0xff.toByte; bad2(19) = 0x7f.toByte
    assert(MediaDecode.wavPcm16(bad2).isEmpty)
  }

  // ---- WAV PCM -----------------------------------------------------

  private def wavPcm(samples: Seq[Int]): Array[Byte] = {
    val data = samples.map(s => le(s.toLong & 0xffff, 2)).mkString
    hex("52494646" + le(36 + samples.size * 2, 4) + "57415645" +
      "666D7420" + le(16, 4) + "0100" + "0100" + le(8000, 4) + le(16000, 4) + "0200" + "1000" +
      "64617461" + le(samples.size * 2, 4) + data)
  }

  test("WAV PCM16: samples, RMS and peak are exact") {
    val pcm = MediaDecode.wavPcm16(wavPcm(Seq(0, 16384, -16384, 32767))).get
    assert(pcm.toSeq == Seq[Short](0, 16384, -16384, 32767))
    assert(MediaDecode.peak(pcm) == 32767.0 / 32768.0)
    val expectedRms = math.sqrt(
      (0.0 + 16384.0 * 16384 + 16384.0 * 16384 + 32767.0 * 32767) / 4) / 32768.0
    assert(math.abs(MediaDecode.rms(pcm) - expectedRms) < 1e-12)
    // non-PCM format tag → None
    val alaw = wavPcm(Seq(1, 2)); alaw(20) = 6
    assert(MediaDecode.wavPcm16(alaw).isEmpty)
  }

  test("WAV PCM 8/24/32-bit and EXTENSIBLE reduce to the 16-bit view") {
    // 8-bit unsigned recenters: 0 -> -32768, 128 -> 0, 255 -> 32512
    val w8 = hex("52494646" + le(36 + 3, 4) + "57415645" +
      "666D7420" + le(16, 4) + "0100" + "0100" + le(8000, 4) + le(8000, 4) + "0100" + "0800" +
      "64617461" + le(3, 4) + "0080FF" + "00")
    assert(MediaDecode.wavPcm16(w8).get.toSeq == Seq[Short](-32768, 0, 32512))
    // 24-bit EXTENSIBLE (PCM GUID): arithmetic shift to 16
    val w24 = hex("52494646" + "48000000" + "57415645" +
      "666D7420" + "28000000" + "FEFF" + "0100" + "401F0000" + "C05D0000" +
      "0300" + "1800" + "1600" + "1800" + "04000000" +
      "0100000000001000800000AA00389B71" +
      "64617461" + "0C000000" + "000040" + "FFFFFF" + "000080" + "34129A")
    assert(MediaDecode.wavPcm16(w24).get.toSeq == Seq[Short](16384, -1, -32768, -26094))
    // 32-bit plain PCM
    val w32 = hex("52494646" + le(36 + 8, 4) + "57415645" +
      "666D7420" + le(16, 4) + "0100" + "0100" + le(8000, 4) + le(32000, 4) + "0400" + "2000" +
      "64617461" + le(8, 4) + "00000040" + "0000C0FF")
    assert(MediaDecode.wavPcm16(w32).get.toSeq == Seq[Short](16384, -64))
    // EXTENSIBLE with a non-PCM SubFormat GUID -> None
    val bad = w24.clone(); bad(44) = 3 // IEEE-float GUID lead
    assert(MediaDecode.wavPcm16(bad).isEmpty)
  }

  // ---- GIF ---------------------------------------------------------

  /** 2×2 GIF89a, 4-color palette, root codes only (the mm_pixel_stats
    * fixture): pixels red, green / blue, #FF8040.
    */
  private val gif2x2: Array[Byte] =
    hex("474946383961" + "02000200" + "91" + "0000" +
      "FF0000" + "00FF00" + "0000FF" + "FF8040" +
      "2C" + "00000000" + "02000200" + "00" +
      "02" + "03" + "443405" + "00" + "3B")

  test("GIF: 2x2 root-code frame decodes through the palette") {
    val px = MediaDecode.gifPixels(gif2x2).get
    assert((px.width, px.height, px.channels) == (2, 2, 3))
    val rgb = px.data.map(_ & 0xff).toSeq
    assert(rgb == Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 128, 64), rgb)
    assert(px.meanChannel(0) == 127.5 && px.meanChannel(1) == 95.75 && px.meanChannel(2) == 79.75)
    // imagePixels dispatches GIF after png/bmp/jpeg
    assert(MediaDecode.imagePixels(gif2x2).get.data.toSeq == px.data.toSeq)
  }

  test("GIF: dictionary self-reference code (cScSc pattern) and compressed runs decode") {
    // 4×1, palette 4, pixels 0,0,0,0 via codes clear(4), 0 (root,
    // 1 px), 6 (== dictSize: self-ref entry [0,0], 2 px, dict → 7),
    // 0 (adds dict[7], dict → 8 bumps code size to 4, 1 px), eoi(5)
    // read at 4 bits. LSB-first bit stream:
    // 001 000 011 000 1010 → byte0 = 0x84, byte1 = 0x51
    val g = hex("474946383961" + "04000100" + "91" + "0000" +
      "FF0000" + "00FF00" + "0000FF" + "FFFFFF" +
      "2C" + "00000000" + "04000100" + "00" +
      "02" + "02" + "8451" + "00" + "3B")
    val px = MediaDecode.gifPixels(g).get
    assert(px.data.map(_ & 0xff).toSeq == Seq(255, 0, 0, 255, 0, 0, 255, 0, 0, 255, 0, 0))
  }

  test("GIF: interlaced rows land in display order") {
    // 1×4 interlaced, distinct colors; stored row order under the
    // 4-pass scheme for h=4 is display rows 0, 2, 1, 3 — codes are
    // roots 0,1,2,3 so stored pixel i = color i: display must come
    // back 0, 2, 1, 3 (stored row 1 → display 2, stored 2 → display 1)
    val g = hex("474946383961" + "01000400" + "91" + "0000" +
      "FF0000" + "00FF00" + "0000FF" + "FFFFFF" +
      "2C" + "00000000" + "01000400" + "40" +
      "02" + "03" + "443405" + "00" + "3B")
    val px = MediaDecode.gifPixels(g).get
    val rows = px.data.grouped(3).map(_.map(_ & 0xff).toSeq).toSeq
    assert(rows == Seq(
      Seq(255, 0, 0),      // stored 0 → display 0 (color 0)
      Seq(0, 0, 255),      // stored 2 (color 2) → display 1
      Seq(0, 255, 0),      // stored 1 (color 1) → display 2
      Seq(255, 255, 255)), // stored 3 → display 3
      rows)
  }

  test("GIF: extensions are skipped; malformed streams return None") {
    // graphic-control extension before the descriptor
    val withExt = gif2x2.take(25) ++ hex("21F904" + "04000000" + "00") ++ gif2x2.drop(25)
    assert(MediaDecode.gifPixels(withExt).get.data.toSeq ==
      MediaDecode.gifPixels(gif2x2).get.data.toSeq)
    // out-of-range code (first code = clear+2 → invalid as a root)
    val badCode = gif2x2.clone()
    badCode(37) = 0x46 // first data byte: code 4 then code 6 where root expected
    assert(MediaDecode.gifPixels(badCode).isEmpty)
    // truncated LZW data (too few pixels decoded)
    assert(MediaDecode.gifPixels(gif2x2.take(38) ++ hex("00" + "3B")).isEmpty)
    // no palette at all (GCT flag off, no LCT)
    val noPal = gif2x2.clone(); noPal(10) = 0x11
    assert(MediaDecode.gifPixels(noPal).isEmpty)
  }

  // ---- WAV IMA ADPCM -----------------------------------------------

  /** mono IMA-ADPCM WAV: one 8-byte block — predictor 1000, step
    * index 10, nibbles 1,7,F,8,4,2,0,F (low first). Hand-traced
    * through the published tables: step 19 → +6, step 17 → +31,
    * step 37 → −68, step 80 → −10, step 73 → +82, step 88 → +55,
    * step 80 → +10, step 73 → −136.
    */
  private val adpcmMono: Array[Byte] =
    hex("52494646" + le(48, 4) + "57415645" +
      "666D7420" + le(20, 4) + "1100" + "0100" + le(8000, 4) + le(7111, 4) +
      "0800" + "0400" + "0200" + "0900" +
      "64617461" + le(8, 4) + "E803" + "0A" + "00" + "718F24F0")

  test("WAV IMA-ADPCM mono: state machine matches the hand trace") {
    val s = MediaDecode.wavAdpcmSamples(adpcmMono).get
    assert(s.toSeq == Seq[Short](1000, 1006, 1037, 969, 959, 1041, 1096, 1106, 970))
    // wavSamples dispatches: PCM stays PCM, ADPCM reaches the new path
    assert(MediaDecode.wavSamples(adpcmMono).get.toSeq == s.toSeq)
    assert(MediaDecode.wavPcm16(adpcmMono).isEmpty)
  }

  test("WAV IMA-ADPCM stereo: headers then 4-byte words round-robin, low nibble first") {
    // ch=2, blockAlign=16, spb=9: two 4-byte headers, then one 4-byte
    // word per channel. L: pred 100 idx 0 nibbles all 0 (+0 each via
    // diff=step>>3 with step 7 → 0 forever... step>>3 of 7 = 0) —
    // predictor stays 100, index clamps at 0. R: pred -200 idx 88
    // nibbles all 8 (sign-only: diff = 32767>>3 = 4095 subtract,
    // clamping at -32768; index 88+(-1) each step).
    val st = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
      34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157,
      173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
      724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
      2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
      7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
      22385, 24623, 27086, 29794, 32767)
    val wav = hex("52494646" + le(12 + 28 + 8 + 16, 4) + "57415645" +
      "666D7420" + le(20, 4) + "1100" + "0200" + le(8000, 4) + le(8000, 4) +
      le(16, 2) + "0400" + "0200" + "0900" +
      "64617461" + le(16, 4) +
      le(100, 2) + "00" + "00" +                    // L header: pred 100, idx 0
      le((-200).toLong & 0xffff, 2) + "58" + "00" + // R header: pred -200, idx 88
      "00000000" + "88888888")                      // L word, R word
    val s = MediaDecode.wavAdpcmSamples(wav).get
    assert(s.length == 18)
    val left = s.indices.collect { case i if i % 2 == 0 => s(i) }
    val right = s.indices.collect { case i if i % 2 == 1 => s(i) }
    assert(left.forall(_ == 100), left)
    // replay R independently: sign-only nibbles walk the index down
    var pred = -200; var idx = 88
    val expR = Seq(pred.toShort) ++ (0 until 8).map { _ =>
      val step = st(idx)
      pred = math.max(-32768, pred - (step >> 3)); idx = math.max(0, idx - 1)
      pred.toShort
    }
    assert(right == expR, right)
  }

  test("WAV IMA-ADPCM malformed inputs return None, never throw") {
    // step index > 88
    val badIdx = adpcmMono.clone(); badIdx(50) = 0x59
    assert(MediaDecode.wavAdpcmSamples(badIdx).isEmpty)
    // samplesPerBlock beyond nibble capacity (9 max for blockAlign 8)
    val badSpb = adpcmMono.clone(); badSpb(38) = 0x0a
    assert(MediaDecode.wavAdpcmSamples(badSpb).isEmpty)
    // PCM wav is not ADPCM
    assert(MediaDecode.wavAdpcmSamples(wavPcm(Seq(1, 2))).isEmpty)
    // truncated tail block: decode drops it rather than reading short
    val tail = adpcmMono.dropRight(2)
    // (data size now claims more than present → Long walk rejects)
    assert(MediaDecode.wavAdpcmSamples(tail).isEmpty)
  }

  // ---- TIFF --------------------------------------------------------

  /** 2×2 grey LE TIFF, one strip, pixels 10/200/60/90 (the
    * mm_pixel_stats fixture). */
  private val tiffGreyLe: Array[Byte] =
    hex("49492A00" + "08000000" + "0800" +
      "00010300" + "01000000" + "02000000" +
      "01010300" + "01000000" + "02000000" +
      "02010300" + "01000000" + "08000000" +
      "03010300" + "01000000" + "01000000" +
      "06010300" + "01000000" + "01000000" +
      "11010400" + "01000000" + "6E000000" +
      "15010300" + "01000000" + "01000000" +
      "17010400" + "01000000" + "04000000" +
      "00000000" + "0AC83C5A")

  /** 1×2 RGB BE TIFF, TWO strips (one row each), BitsPerSample and
    * both strip arrays through offsets. */
  private val tiffRgbBe: Array[Byte] =
    hex("4D4D002A" + "00000008" + "0009" +
      "01000003" + "00000001" + "00010000" +
      "01010003" + "00000001" + "00020000" +
      "01020003" + "00000003" + "0000007A" +
      "01030003" + "00000001" + "00010000" +
      "01060003" + "00000001" + "00020000" +
      "01110004" + "00000002" + "00000080" +
      "01150003" + "00000001" + "00030000" +
      "01160003" + "00000001" + "00010000" +
      "01170004" + "00000002" + "00000088" +
      "00000000" +
      "000800080008" +            // bits array at 122
      "00000090" + "00000093" +   // strip offsets at 128
      "00000003" + "00000003" +   // strip byte counts at 136
      "FF0080" + "010203")        // strips at 144/147

  test("TIFF grey LE: single strip decodes; dims and dispatch agree") {
    val px = MediaDecode.tiffPixels(tiffGreyLe).get
    assert((px.width, px.height, px.channels) == (2, 2, 1))
    assert(px.data.map(_ & 0xff).toSeq == Seq(10, 200, 60, 90))
    assert(px.meanChannel(0) == 90.0 && px.meanLuma == 90.0)
    assert(MediaDecode.imagePixels(tiffGreyLe).get.data.toSeq == px.data.toSeq)
    assert(MediaHeaders.imageDims(tiffGreyLe).contains((2L, 2L)))
  }

  test("TIFF RGB BE: multi-strip, offset-stored arrays, big-endian IFD") {
    val px = MediaDecode.tiffPixels(tiffRgbBe).get
    assert((px.width, px.height, px.channels) == (1, 2, 3))
    assert(px.data.map(_ & 0xff).toSeq == Seq(255, 0, 128, 1, 2, 3))
    assert(px.meanChannel(0) == 128.0 && px.meanChannel(2) == 65.5)
    assert(MediaHeaders.imageDims(tiffRgbBe).contains((1L, 2L)))
  }

  /** assemble a single-IFD TIFF (LE) with the given compression /
    * predictor / strip split around pre-compressed strip payloads. */
  private def tiffOf(w: Int, h: Int, channels: Int, comp: Int, predictor: Int,
                     rowsPerStrip: Int, strips: Seq[Array[Byte]]): Array[Byte] = {
    val photo = if (channels == 1) 1 else 2
    val nStrips = strips.length
    val bitsExtra = channels > 2           // count-3 SHORT array goes out of line
    val stripsExtra = nStrips > 1
    val entries = scala.collection.mutable.ArrayBuffer[(Int, Int, Int, Long)]() // tag, type, count, value
    val nEntries = 10
    val ifdEnd = 8 + 2 + nEntries * 12 + 4
    var dataAt = ifdEnd
    val bitsOff = dataAt
    if (bitsExtra) dataAt += 2 * channels
    val soOff = dataAt
    if (stripsExtra) dataAt += 4 * nStrips
    val scOff = dataAt
    if (stripsExtra) dataAt += 4 * nStrips
    val stripAt = new Array[Int](nStrips)
    for (s <- 0 until nStrips) { stripAt(s) = dataAt; dataAt += strips(s).length }
    entries += ((256, 3, 1, w.toLong))
    entries += ((257, 3, 1, h.toLong))
    entries += ((258, 3, channels, if (bitsExtra) bitsOff.toLong else 8L))
    entries += ((259, 3, 1, comp.toLong))
    entries += ((262, 3, 1, photo.toLong))
    entries += ((273, 4, nStrips, if (stripsExtra) soOff.toLong else stripAt(0).toLong))
    entries += ((277, 3, 1, channels.toLong))
    entries += ((278, 3, 1, rowsPerStrip.toLong))
    entries += ((279, 4, nStrips, if (stripsExtra) scOff.toLong else strips(0).length.toLong))
    entries += ((317, 3, 1, predictor.toLong))
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    out.write('I'); out.write('I'); w16(42); w32(8)
    w16(nEntries)
    for ((tag, typ, cnt, v) <- entries) {
      w16(tag); w16(typ); w32(cnt)
      if (typ == 3 && cnt == 1) { w16(v.toInt); w16(0) } else w32(v)
    }
    w32(0) // next IFD
    if (bitsExtra) for (_ <- 0 until channels) w16(8)
    if (stripsExtra) for (s <- 0 until nStrips) w32(stripAt(s))
    if (stripsExtra) for (s <- 0 until nStrips) w32(strips(s).length)
    strips.foreach(out.write)
    out.toByteArray
  }

  /** forward PackBits: literal runs split at 128, repeats for runs ≥ 2. */
  private def packBitsEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && run < 128 && data(i + run) == data(i)) run += 1
      if (run >= 2) { out.write(1 - run); out.write(data(i)); i += run }
      else {
        var lit = 1
        while (i + lit < data.length && lit < 128 &&
          !(i + lit + 1 < data.length && data(i + lit) == data(i + lit + 1))) lit += 1
        out.write(lit - 1)
        out.write(data, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  /** forward TIFF LZW (MSB-first, early change) — independent of the
    * decoder: dictionary keyed by (prefix code, byte). */
  private def tiffLzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var codeSize = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << codeSize) | code; bitCnt += codeSize
      while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    val dict = scala.collection.mutable.HashMap[(Int, Int), Int]()
    var next = 258
    put(256) // clear
    var prev = -1
    for (byte <- data) {
      val v = byte & 0xff
      if (prev == -1) prev = v
      else dict.get((prev, v)) match {
        case Some(c) => prev = c
        case None =>
          put(prev)
          if (next < 4096) { dict((prev, v)) = next; next += 1 }
          // early change: encoder bumps at 512/1024/2048 — its table
          // runs ONE ENTRY AHEAD of the decoder's, which bumps at
          // 511/1023/2047 (the PDF LZWDecode EarlyChange=1 pairing)
          if (next >= (1 << codeSize) && codeSize < 12) codeSize += 1
          prev = v
      }
    }
    if (prev != -1) put(prev)
    put(257) // EOI
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](data.length + 64)
    val n = d.deflate(buf); d.end()
    buf.take(n)
  }

  /** horizontal differencing forward pass (predictor 2). */
  private def hdiff(rows: Array[Byte], rowBytes: Int, channels: Int): Array[Byte] = {
    val out = rows.clone()
    for (r <- 0 until rows.length / rowBytes; x <- (rowBytes - 1) to channels by -1)
      out(r * rowBytes + x) =
        ((rows(r * rowBytes + x) - rows(r * rowBytes + x - channels)) & 0xff).toByte
    out
  }

  test("TIFF LZW / Deflate / PackBits round-trip, with and without the predictor") {
    val w = 7; val h = 5
    for (channels <- Seq(1, 3); predictor <- Seq(1, 2)) {
      val pixels = Array.tabulate(w * h * channels)(i => ((i * 37 + 11) % 256).toByte)
      val rowBytes = w * channels
      val plane = if (predictor == 2) hdiff(pixels, rowBytes, channels) else pixels
      for ((comp, enc) <- Seq[(Int, Array[Byte] => Array[Byte])](
          5 -> tiffLzwEncode, 8 -> deflate, 32773 -> packBitsEncode, 1 -> identity)) {
        val t = tiffOf(w, h, channels, comp, predictor, h, Seq(enc(plane)))
        val px = MediaDecode.tiffPixels(t)
        assert(px.isDefined, s"comp=$comp ch=$channels pred=$predictor")
        assert(px.get.data.toSeq == pixels.toSeq, s"comp=$comp ch=$channels pred=$predictor")
      }
    }
  }

  test("TIFF compressed multi-strip: strips decode independently, predictor resets per row") {
    val w = 4; val h = 6; val rps = 2
    val pixels = Array.tabulate(w * h * 3)(i => ((i * 29 + 3) % 256).toByte)
    val rowBytes = w * 3
    val strips = (0 until h by rps).map { r0 =>
      val strip = pixels.slice(r0 * rowBytes, (r0 + rps) * rowBytes)
      tiffLzwEncode(hdiff(strip, rowBytes, 3))
    }
    val t = tiffOf(w, h, 3, 5, 2, rps, strips)
    assert(MediaDecode.tiffPixels(t).get.data.toSeq == pixels.toSeq)
    // strip count disagreeing with rowsPerStrip → None
    assert(MediaDecode.tiffPixels(tiffOf(w, h, 3, 5, 2, rps, strips.take(2))).isEmpty)
  }

  test("TIFF LZW: early-change width bump decodes across the 510-entry boundary") {
    // > 300 distinct pairs so the dictionary crosses 510 entries and
    // the code width bumps 9→10 under early change
    val w = 32; val h = 40
    val pixels = Array.tabulate(w * h)(i => ((i * 7 + (i / 13) * 31 + (i * i % 97)) % 256).toByte)
    val t = tiffOf(w, h, 1, 5, 1, h, Seq(tiffLzwEncode(pixels)))
    assert(MediaDecode.tiffPixels(t).get.data.toSeq == pixels.toSeq)
  }

  test("TIFF compressed malformed payloads return None, never throw") {
    val pixels = Array.tabulate(16)(i => (i * 17).toByte)
    // LZW stream truncated mid-code
    val lzw = tiffLzwEncode(pixels)
    assert(MediaDecode.tiffPixels(tiffOf(4, 4, 1, 5, 1, 4, Seq(lzw.dropRight(3)))).isEmpty)
    // PackBits literal run overrunning the strip payload
    assert(MediaDecode.tiffPixels(tiffOf(4, 4, 1, 32773, 1, 4, Seq(Array[Byte](12, 1, 2)))).isEmpty)
    // Deflate garbage
    assert(MediaDecode.tiffPixels(tiffOf(4, 4, 1, 8, 1, 4, Seq(Array[Byte](1, 2, 3, 4)))).isEmpty)
    // unknown predictor
    assert(MediaDecode.tiffPixels(tiffOf(4, 4, 1, 1, 3, 4, Seq(pixels))).isEmpty)
  }

  test("TIFF malformed inputs return None, never throw") {
    def mut(at: Int, v: Int): Array[Byte] = {
      val m = tiffGreyLe.clone(); m(at) = v.toByte; m
    }
    assert(MediaDecode.tiffPixels(mut(54, 7)).isEmpty)   // JPEG-in-TIFF compression
    assert(MediaDecode.tiffPixels(mut(66, 3)).isEmpty)   // palette photometric
    assert(MediaDecode.tiffPixels(mut(42, 16)).isEmpty)  // 16-bit channels
    assert(MediaDecode.tiffPixels(mut(102, 3)).isEmpty)  // byte count != w*h*spp
    assert(MediaDecode.tiffPixels(mut(78, 0xF0)).isEmpty) // strip past the end
    assert(MediaDecode.tiffPixels(tiffGreyLe.take(20)).isEmpty)
    assert(MediaDecode.tiffPixels(hex("49492B00" + "08000000")).isEmpty) // magic != 42
  }

  test("HeaderCodec emits REAL features for TIFF images") {
    val out = new Multimodal.HeaderCodec(6)
      .decode(Iterator(Multimodal.MediaRow(10L, "image", tiffGreyLe))).next()
    assert(out.width == 2 && out.height == 2)
    // grey replicates into the luma + R/G/B slots
    (0 to 3).foreach(i => assert(math.abs(out.features(i) - 90f / 255f) < 1e-6))
  }

  // ---- WAV G.711 μ-law / A-law ------------------------------------

  /** mono G.711 WAV with the given format tag and companded bytes. */
  private def wavG711(tag: Int, bytes: String): Array[Byte] =
    hex("52494646" + le(34 + bytes.length / 2, 4) + "57415645" +
      "666D7420" + le(18, 4) + le(tag, 2) + "0100" + le(8000, 4) + le(8000, 4) +
      "0100" + "0800" + "0000" +
      "64617461" + le(bytes.length / 2, 4) + bytes)

  test("WAV G.711 mu-law: expand matches the ITU-T table landmarks") {
    // 0x0A → −21884, 0xFF → +0, 0x62 → −340, 0x80 → +32124 (max), and
    // the canonical extremes 0x00 → −32124, 0x7F → −0
    val s = MediaDecode.wavG711Samples(wavG711(7, "0AFF6280" + "007F")).get
    assert(s.toSeq == Seq[Short](-21884, 0, -340, 32124, -32124, 0), s.toSeq)
    // dispatch: reaches the G.711 branch, not PCM/ADPCM
    assert(MediaDecode.wavSamples(wavG711(7, "0AFF6280")).get.toSeq ==
      Seq[Short](-21884, 0, -340, 32124))
    assert(MediaDecode.wavPcm16(wavG711(7, "0AFF6280")).isEmpty)
    assert(MediaDecode.wavAdpcmSamples(wavG711(7, "0AFF6280")).isEmpty)
  }

  test("WAV G.711 A-law: expand matches, with the OPPOSITE sign-bit convention") {
    // 0x55 → −8 (quiet negative), 0xD5 → +8, 0x2A → −32256 (min),
    // 0xAA → +32256 (max)
    val s = MediaDecode.wavG711Samples(wavG711(6, "55D52AAA")).get
    assert(s.toSeq == Seq[Short](-8, 8, -32256, 32256), s.toSeq)
    assert(MediaDecode.peak(s) == 32256.0 / 32768.0)
  }

  test("WAV G.711 malformed inputs return None, never throw") {
    // PCM tag is not G.711
    assert(MediaDecode.wavG711Samples(wavPcm(Seq(1, 2))).isEmpty)
    // G.711 must be 8-bit: flip bits-per-sample to 16
    val bad = wavG711(7, "0AFF"); bad(34) = 16
    assert(MediaDecode.wavG711Samples(bad).isEmpty)
    // data size past the buffer: Long walk rejects
    val trunc = wavG711(6, "55D52AAA").dropRight(2)
    assert(MediaDecode.wavG711Samples(trunc).isEmpty)
  }

  test("HeaderCodec emits REAL features for G.711 audio") {
    val out = new Multimodal.HeaderCodec(6)
      .decode(Iterator(Multimodal.MediaRow(8L, "audio", wavG711(6, "55D52AAA")))).next()
    val rms = math.sqrt((64.0 + 64.0 + 2 * 32256.0 * 32256.0) / 4) / 32768.0
    assert(math.abs(out.features(0) - rms.toFloat) < 1e-7)
    assert(math.abs(out.features(1) - 32256f / 32768f) < 1e-7)
  }

  test("HeaderCodec emits REAL features for ADPCM audio (RMS/peak from decoded samples)") {
    val out = new Multimodal.HeaderCodec(6)
      .decode(Iterator(Multimodal.MediaRow(4L, "audio", adpcmMono))).next()
    val samples = Seq(1000, 1006, 1037, 969, 959, 1041, 1096, 1106, 970)
    val rms = math.sqrt(samples.map(v => v.toDouble * v).sum / 9) / 32768.0
    assert(math.abs(out.features(0) - rms.toFloat) < 1e-7)
    assert(math.abs(out.features(1) - 1106f / 32768f) < 1e-7)
  }

  test("HeaderCodec emits REAL features for decodable bytes, stub otherwise") {
    val codec = new Multimodal.HeaderCodec(6)
    val out = codec.decode(Iterator(
      Multimodal.MediaRow(1L, "image", bmp2x2(false)),
      Multimodal.MediaRow(2L, "audio", wavPcm(Seq(0, 16384, -16384, 32767))),
      Multimodal.MediaRow(3L, "image", hex("DEADBEEF")))).toList
    // image: meanLuma + RGB channel means (each channel mean = (255+0+0+255)/4... per channel)
    val img = out(0)
    assert(img.width == 2 && img.height == 2)
    val meanR = (255 + 0 + 0 + 255) / 4.0 / 255.0
    assert(math.abs(img.features(1) - meanR) < 1e-6)
    // audio: features(0)=rms, features(1)=peak
    val aud = out(1)
    assert(math.abs(aud.features(1) - 32767f / 32768f) < 1e-6)
    assert(aud.features(0) > 0f && aud.features(0) < 1f)
    // undecodable image keeps the full stub vector
    val stub = new Multimodal.StubCodec(6)
      .decode(Iterator(Multimodal.MediaRow(3L, "image", hex("DEADBEEF")))).next()
    assert(out(2).features.toSeq == stub.features.toSeq)
  }

  test("HeaderCodec decodes JPEG content for real (flat DC-only block)") {
    // hand-built greyscale DC-only JPEG: every sample 138 (see
    // JpegDecodeSpec) → meanLuma feature = 138/255 exactly
    val jpeg = hex("FFD8" + "FFDB" + "0043" + "00" + "10" * 64 +
      "FFC0" + "000B" + "08" + "0008" + "0008" + "01" + "01" + "11" + "00" +
      "FFC4" + "0014" + "00" + "01" + "00" * 15 + "03" +
      "FFC4" + "0014" + "10" + "01" + "00" * 15 + "00" +
      "FFDA" + "0008" + "01" + "01" + "00" + "00" + "3F" + "00" +
      "57" + "FFD9") // bits: 0 101 0 + 111 pad = 01010111 = 0x57
    val out = new Multimodal.HeaderCodec(6)
      .decode(Iterator(Multimodal.MediaRow(9L, "image", jpeg))).next()
    assert(out.width == 8 && out.height == 8)
    assert(math.abs(out.features(0) - 138f / 255f) < 1e-6)
  }

  test("windowFeatures: exact integers, partial tail, zcr convention") {
    import MediaDecode.{AudioWindow, windowFeatures}
    // 9 samples, window 4 → two full windows + a 1-sample tail
    val pcm = Array[Short](1000, -2000, 3000, -32768, 0, -1, 1, 5, -5)
    val w = windowFeatures(pcm, 4)
    assert(w == Seq(
      // zcr counts negative↔non-negative flips WITHIN the window only
      AudioWindow(0, 4, 3, 1000L * 1000 + 2000L * 2000 + 3000L * 3000 + 32768L * 32768, 32768),
      // 0 is non-negative: 0→-1 flips, -1→1 flips, 1→5 doesn't
      AudioWindow(1, 4, 2, 1L + 1 + 25, 5),
      AudioWindow(2, 1, 0, 25L, 5)))
    // empty input → no windows; window == length → one window
    assert(windowFeatures(Array.empty[Short], 4).isEmpty)
    assert(windowFeatures(Array[Short](7, -7), 2) ==
      Seq(AudioWindow(0, 2, 1, 98L, 7)))
  }

  test("audioWindows: cross-window sign changes do NOT count as crossings") {
    // window boundary between -1 | 1: each window sees no flip
    val pcm = Array[Short](-2, -1, 1, 2)
    val w = MediaDecode.windowFeatures(pcm, 2)
    assert(w.map(_.zcr) == Seq(0, 0))
  }

  test("tileFeatures: exact integers, edge tiles, channel conventions") {
    import MediaDecode.{ImageTile, PixelImage, tileFeatures}
    // 3×3 RGB, tile 2 → 2×2 grid with 1-wide/1-tall edge tiles;
    // pixel (x,y) = (x*10, y*10 + x, 100 + x + y)
    val data = new Array[Byte](27)
    for (y <- 0 until 3; x <- 0 until 3) {
      val b = (y * 3 + x) * 3
      data(b) = (x * 10).toByte; data(b + 1) = (y * 10 + x).toByte
      data(b + 2) = (100 + x + y).toByte
    }
    val t = tileFeatures(PixelImage(3, 3, 3, data), 2)
    assert(t.map(x => (x.tileX, x.tileY, x.nPx)) ==
      Seq((0, 0, 4), (1, 0, 2), (0, 1, 2), (1, 1, 1)))
    // tile (0,0): pixels (0,0) (1,0) (0,1) (1,1): g = 0, 1, 10, 11
    val t00 = t.head
    assert(t00.sumG == 22 && t00.sumSqG == 0 + 1 + 100 + 121)
    assert(t00.minG == 0 && t00.maxG == 11)
    assert(t00.sumR == 0 + 10 + 0 + 10)
    // tile (1,1): single pixel (2,2): r=20, g=22, b=104
    val t11 = t.last
    assert(t11.nPx == 1 && t11.sumR == 20 && t11.sumG == 22 && t11.sumB == 104)
    assert(t11.sumSqG == 22L * 22 && t11.minG == 22 && t11.maxG == 22)
    // gray image (1 channel): all three sums read the gray plane
    val gray = tileFeatures(PixelImage(2, 1, 1, Array[Byte](5, 9)), 4)
    assert(gray == Seq(ImageTile(0, 0, 2, 14, 14, 14, 25 + 81, 5, 9)))
  }

  test("aHash63: known bit patterns, grid averaging, small-image None") {
    import MediaDecode.{PixelImage, aHash63}
    def gray8x8(f: (Int, Int) => Int): PixelImage =
      PixelImage(8, 8, 1, Array.tabulate(64)(i => f(i % 8, i / 8).toByte))
    // solid: no cell is strictly above the global average → hash 0
    assert(aHash63(gray8x8((_, _) => 200)).contains(0L))
    // top half bright: cells of rows 0-3 set → bits 0..31
    assert(aHash63(gray8x8((_, y) => if (y < 4) 255 else 0)).contains(0xFFFFFFFFL))
    // left half bright: bits with cx < 4 in every row (row 7 keeps
    // only cells 56-58 + 59? no — bits stop at 62, cx<4 ⇒ 56-59 < 63)
    val left = aHash63(gray8x8((x, _) => if (x < 4) 255 else 0)).get
    assert(left == (0 until 63).filter(i => i % 8 < 4).map(1L << _).sum)
    // 16×8: two pixels per cell average together — alternating 255/0
    // columns inside each cell make every cell equal the global mean
    val alt = PixelImage(16, 8, 1,
      Array.tabulate(16 * 8)(i => (if (i % 2 == 0) 255 else 0).toByte))
    assert(aHash63(alt).contains(0L))
    // and a 16-wide bright-left layout lands the same bits as 8-wide
    val wide = PixelImage(16, 8, 1,
      Array.tabulate(16 * 8)(i => (if (i % 16 < 8) 255 else 0).toByte))
    assert(aHash63(wide).get == left)
    // below the 8-cell grid → None
    assert(aHash63(PixelImage(7, 8, 1, new Array[Byte](56))).isEmpty)
    assert(aHash63(PixelImage(8, 7, 1, new Array[Byte](56))).isEmpty)
    // RGB weighting: a green-only image outweighs a red-only one
    val rgb = PixelImage(8, 8, 3, Array.tabulate(192) { i =>
      val x = (i / 3) % 8
      val c = i % 3
      // left half green 200, right half red 200: green luma 587*200
      // beats the global average, red luma 299*200 falls below it
      if (x < 4 && c == 1) 200.toByte else if (x >= 4 && c == 0) 200.toByte else 0.toByte
    })
    assert(aHash63(rgb).get == (0 until 63).filter(i => i % 8 < 4).map(1L << _).sum)
  }

  test("audioHash63: energy deltas, cell averaging, short-clip None") {
    import MediaDecode.audioHash63
    // 64 samples, one per cell: strictly rising magnitudes → all bits
    val rising = Array.tabulate(64)(i => (i * 10).toShort)
    assert(audioHash63(rising).contains((1L << 63) - 1))
    // constant → no strict increase anywhere
    assert(audioHash63(Array.fill(64)(100.toShort)).contains(0L))
    // SIGN does not matter, energy does: alternating ±v is constant energy
    assert(audioHash63(Array.tabulate(64)(i => (if (i % 2 == 0) 500 else -500).toShort))
      .contains(0L))
    // 128 samples → 2 per cell, floor-average: one loud cell (20)
    // sets exactly the rise INTO it (bit 19); the fall after it is a
    // decrease, so bit 20 stays clear
    val two = Array.fill(128)(10.toShort)
    two(40) = 1000; two(41) = 1000 // cell 20 loud
    assert(audioHash63(two).contains(1L << 19))
    // below the grid → None
    assert(audioHash63(Array.fill(63)(5.toShort)).isEmpty)
    assert(audioHash63(Array.empty[Short]).isEmpty)
  }
}
