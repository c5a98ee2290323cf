package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG decode, verified two independent ways:
  *
  *  1. EXACT: hand-assembled DC-only JPEGs whose decoded value is
  *     analytic (flat block = round(DC·q∕8) + 128) — every stage
  *     (marker parse, Huffman, dequant, IDCT, color convert) must be
  *     bit-right for these to pass.
  *  2. APPROXIMATE: images encoded by the JDK's own ImageIO JPEG
  *     writer, decoded by BOTH ImageIO and [[JpegDecode]] — the two
  *     decoders must agree within IDCT/upsampling rounding tolerance.
  *     ImageIO stays a TEST oracle only: it rides the platform's
  *     libjpeg, so its output is not promised identical across JVMs,
  *     while [[JpegDecode]]'s fixed-order arithmetic is.
  */
class JpegDecodeSpec extends AnyFunSuite {

  // ---- helpers ----------------------------------------------------

  private def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    writer.write(null, new IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  private def encodeProgressive(img: BufferedImage, quality: Float): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  private def noise(w: Int, h: Int, typ: Int, seed: Long): BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val img = new BufferedImage(w, h, typ)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (rnd.nextInt(256) << 16) | (rnd.nextInt(256) << 8) | rnd.nextInt(256))
    img
  }

  private def gradient(w: Int, h: Int, typ: Int): BufferedImage = {
    val img = new BufferedImage(w, h, typ)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / math.max(w - 1, 1)
      val g = (y * 255) / math.max(h - 1, 1)
      val b = ((x + y) * 255) / math.max(w + h - 2, 1)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  /** max abs per-pixel diff and mean abs diff vs ImageIO's decode.
    * Greyscale reads RAW raster samples — getRGB would push the
    * linear-gray plane through sRGB gamma and compare the wrong thing.
    */
  private def diffVsImageIO(jpeg: Array[Byte]): (Int, Double) = {
    val ours = JpegDecode.jpegPixels(jpeg).getOrElse(fail("JpegDecode returned None"))
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(ours.width == ref.getWidth && ours.height == ref.getHeight)
    var maxD = 0
    var sumD = 0L
    var n = 0
    for (y <- 0 until ours.height; x <- 0 until ours.width) {
      val refC =
        if (ours.channels == 1) Array(ref.getRaster.getSample(x, y, 0))
        else {
          val rgb = ref.getRGB(x, y)
          Array((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        }
      for (c <- refC.indices) {
        val d = math.abs((ours.data((y * ours.width + x) * ours.channels + c) & 0xff) - refC(c))
        maxD = math.max(maxD, d); sumD += d; n += 1
      }
    }
    (maxD, sumD.toDouble / n)
  }

  // hand-built greyscale DC-only JPEG: quant table all-16, one Huffman
  // DC table (code '0' -> size cat s), AC table ('0' -> EOB). A single
  // 8x8 block whose every sample = round(dc*16/8) + 128.
  private def dcOnlyGrey(dcCat: Int, dcBits: Int, w: Int = 8, h: Int = 8): Array[Byte] = {
    def hex(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val dqt = "FFDB" + "0043" + "00" + "10" * 64
    val sof = "FFC0" + "000B" + "08" + f"$h%04X" + f"$w%04X" + "01" + "01" + "11" + "00"
    // one code of length 1 ('0'): DC table maps it to size-cat dcCat,
    // AC table to 0x00 (EOB); segment length 2 + 1 + 16 + 1 = 0x14
    val dhtDc = "FFC4" + "0014" + "00" + "01" + "00" * 15 + f"$dcCat%02X"
    val dhtAc = "FFC4" + "0014" + "10" + "01" + "00" * 15 + "00"
    val sos = "FFDA" + "0008" + "01" + "01" + "00" + "00" + "3F" + "00"
    // entropy data: huffman code '0' (1 bit) + dcCat magnitude bits + AC
    // huffman '0' (EOB), padded with 1s to a byte
    val nBits = 1 + dcCat + 1
    var acc = 0L
    acc = (acc << 1) | 0 // DC code
    acc = (acc << dcCat) | dcBits
    acc = (acc << 1) | 0 // EOB
    val pad = (8 - (nBits % 8)) % 8
    acc = (acc << pad) | ((1 << pad) - 1)
    val nBytes = (nBits + pad) / 8
    val data = (nBytes - 1 to 0 by -1).map(k => f"${(acc >> (8 * k)) & 0xff}%02X").mkString
    hex("FFD8" + dqt + sof + dhtDc + dhtAc + sos + data + "FFD9")
  }

  // ---- exact tests ------------------------------------------------

  test("DC-only block decodes to the analytic flat value") {
    // dc = +5 (cat 3, bits 101): value = round(5*16/8) + 128 = 138
    val img = JpegDecode.jpegPixels(dcOnlyGrey(3, 5)).get
    assert(img.width == 8 && img.height == 8 && img.channels == 1)
    assert(img.data.forall(b => (b & 0xff) == 138), s"got ${img.data.map(_ & 0xff).toSeq}")
    // dc = -3 (cat 2, bits 00 = ~3): value = round(-3*16/8) + 128 = 122
    val neg = JpegDecode.jpegPixels(dcOnlyGrey(2, 0)).get
    assert(neg.data.forall(b => (b & 0xff) == 122))
    // dc = 0 (cat 0): flat 128
    val zero = JpegDecode.jpegPixels(dcOnlyGrey(0, 0)).get
    assert(zero.data.forall(b => (b & 0xff) == 128))
    // dc = +44 (cat 6, bits 101100): value = 44*16/8 + 128 = 216 — this
    // is the mm_pixel_stats oracle fixture (its 8 entropy bits are
    // byte-aligned, so DuckDB re-derives the plane from the raw bytes)
    val cat6 = JpegDecode.jpegPixels(dcOnlyGrey(6, 44)).get
    assert(cat6.data.forall(b => (b & 0xff) == 216))
    // dc = -40 (cat 6, bits 010111 = ~40): value = -40*16/8 + 128 = 48
    // — the negative-magnitude mm_pixel_stats oracle fixture
    val cat6n = JpegDecode.jpegPixels(dcOnlyGrey(6, 23)).get
    assert(cat6n.data.forall(b => (b & 0xff) == 48))
  }

  test("image smaller than the MCU crops the padded plane") {
    val img = JpegDecode.jpegPixels(dcOnlyGrey(3, 5, w = 5, h = 3)).get
    assert(img.width == 5 && img.height == 3)
    assert(img.data.length == 15 && img.data.forall(b => (b & 0xff) == 138))
  }

  // ---- ImageIO cross-decoder tests --------------------------------

  test("greyscale ImageIO JPEG: decoders agree within rounding") {
    val jpeg = encodeJpeg(gradient(24, 16, BufferedImage.TYPE_BYTE_GRAY), 0.95f)
    val (maxD, meanD) = diffVsImageIO(jpeg)
    assert(maxD <= 2, s"max per-pixel diff $maxD")
    assert(meanD <= 1.0, s"mean diff $meanD")
  }

  test("RGB ImageIO JPEG (4:2:0 default): decoders agree within upsampling tolerance") {
    val jpeg = encodeJpeg(gradient(40, 24, BufferedImage.TYPE_3BYTE_BGR), 0.9f)
    val (maxD, meanD) = diffVsImageIO(jpeg)
    // triangle upsampling matches libjpeg's fancy filter to rounding
    assert(maxD <= 4, s"max per-pixel diff $maxD")
    assert(meanD <= 1.0, s"mean diff $meanD")
    // channel means (what HeaderCodec actually emits) must agree closely
    val ours = JpegDecode.jpegPixels(jpeg).get
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    for (c <- 0 until 3) {
      val refMean = (for (y <- 0 until ref.getHeight; x <- 0 until ref.getWidth)
        yield ((ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff).toDouble).sum / (ref.getWidth * ref.getHeight)
      assert(math.abs(ours.meanChannel(c) - refMean) < 1.5,
        s"channel $c mean ${ours.meanChannel(c)} vs $refMean")
    }
  }

  // JDK writer stays 4:2:0 even at quality 1.0 — the residual is only
  // the chroma upsampling filter (nearest vs libjpeg triangle)
  test("max-quality RGB: tight agreement") {
    val jpeg = encodeJpeg(gradient(16, 16, BufferedImage.TYPE_3BYTE_BGR), 1.0f)
    val (maxD, meanD) = diffVsImageIO(jpeg)
    assert(maxD <= 4, s"max per-pixel diff $maxD")
    assert(meanD <= 0.5, s"mean diff $meanD")
  }

  // ---- progressive (SOF2) cross-decoder tests ---------------------

  test("progressive greyscale: decoders agree (SOF2 actually emitted)") {
    val jpeg = encodeProgressive(gradient(24, 16, BufferedImage.TYPE_BYTE_GRAY), 0.9f)
    // sanity: the writer really produced a progressive frame
    assert(jpeg.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2))
    val (maxD, meanD) = diffVsImageIO(jpeg)
    assert(maxD <= 2, s"maxD=$maxD")
    assert(meanD <= 0.5, s"meanD=$meanD")
  }

  test("progressive RGB 4:2:0: decoders agree within upsampling tolerance") {
    val jpeg = encodeProgressive(gradient(40, 24, BufferedImage.TYPE_3BYTE_BGR), 0.9f)
    assert(jpeg.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2))
    val (maxD, meanD) = diffVsImageIO(jpeg)
    assert(maxD <= 4, s"maxD=$maxD")
    assert(meanD <= 1.0, s"meanD=$meanD")
  }

  test("progressive noise images across qualities: EOB runs, ZRL and refinement survive") {
    // noise maximizes nonzero AC traffic; LOW quality maximizes EOB
    // runs and successive-approximation refinement corrections
    for ((q, seed) <- Seq(0.3f -> 1L, 0.6f -> 2L, 0.95f -> 3L)) {
      val jpeg = encodeProgressive(noise(33, 18, BufferedImage.TYPE_3BYTE_BGR, seed), q)
      val (maxD, meanD) = diffVsImageIO(jpeg)
      assert(maxD <= 4, s"q=$q maxD=$maxD")
      assert(meanD <= 1.0, s"q=$q meanD=$meanD")
    }
  }

  test("progressive odd dims and greyscale noise: sub-grid raster scans line up") {
    for ((w, h) <- Seq((17, 9), (8, 8), (7, 23))) {
      val jpeg = encodeProgressive(noise(w, h, BufferedImage.TYPE_BYTE_GRAY, w * 100L + h), 0.7f)
      val (maxD, meanD) = diffVsImageIO(jpeg)
      assert(maxD <= 2, s"$w x $h maxD=$maxD")
      assert(meanD <= 0.5, s"$w x $h meanD=$meanD")
    }
  }

  test("progressive truncation and corruption return None, never throw") {
    val jpeg = encodeProgressive(gradient(24, 16, BufferedImage.TYPE_3BYTE_BGR), 0.9f)
    // cut before EOI: scans decoded but no finish
    assert(JpegDecode.jpegPixels(jpeg.dropRight(2)).isEmpty)
    // cut inside the scan data
    assert(JpegDecode.jpegPixels(jpeg.take(jpeg.length / 2)).isEmpty)
    for (cut <- 1 until math.min(jpeg.length, 120))
      JpegDecode.jpegPixels(jpeg.take(cut)) // must not throw
  }

  test("progressive coefficient stores are bomb-guarded at parse time") {
    // 8192x8192 passes the sequential pixel cap, but progressive
    // buffers 4-byte coefficients — the SOF2 geometry guard must
    // refuse BEFORE any allocation (header-only file, no scan data)
    def hx(str: String): Array[Byte] =
      str.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val big = hx("FFD8" + "FFDB" + "0043" + "00" + "10" * 64 +
      "FFC2" + "000B" + "08" + "2000" + "2000" + "01011100" + "FFD9")
    assert(JpegDecode.jpegPixels(big).isEmpty)
  }

  test("restart markers reset the DC predictor (hand-built DRI=1 stream)") {
    // 16x8 greyscale = two MCUs, DRI = 1: block1 dc=+5, RST0, block2
    // dc=+5 again — the predictor RESETS at the marker, so both MCUs
    // decode to the same flat 138 (without the reset the second would
    // be 148: pred 5+5=10 → round(10·16∕8)+128)
    def hex(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def mcuBits(dcCat: Int, dcBits: Int): String = {
      val nBits = 1 + dcCat + 1
      var acc = 0L
      acc = (acc << 1) | 0
      acc = (acc << dcCat) | dcBits
      acc = (acc << 1) | 0
      val pad = (8 - (nBits % 8)) % 8
      acc = (acc << pad) | ((1 << pad) - 1)
      (((nBits + pad) / 8 - 1) to 0 by -1).map(k => f"${(acc >> (8 * k)) & 0xff}%02X").mkString
    }
    val jpeg = hex("FFD8" +
      "FFDB" + "0043" + "00" + "10" * 64 +
      "FFC0" + "000B" + "08" + "0008" + "0010" + "01" + "01" + "11" + "00" +
      "FFC4" + "0014" + "00" + "01" + "00" * 15 + "03" +
      "FFC4" + "0014" + "10" + "01" + "00" * 15 + "00" +
      "FFDD" + "0004" + "0001" + // DRI: restart every MCU
      "FFDA" + "0008" + "01" + "01" + "00" + "00" + "3F" + "00" +
      mcuBits(3, 5) + "FFD0" + mcuBits(3, 5) + "FFD9")
    val img = JpegDecode.jpegPixels(jpeg).get
    assert(img.width == 16 && img.height == 8 && img.channels == 1)
    assert(img.data.forall(b => (b & 0xff) == 138),
      s"got ${img.data.map(_ & 0xff).distinct.toSeq}")
    // sanity on a real multi-MCU ImageIO stream too
    val real = encodeJpeg(gradient(64, 48, BufferedImage.TYPE_3BYTE_BGR), 0.8f)
    val rimg = JpegDecode.jpegPixels(real).get
    assert(rimg.width == 64 && rimg.height == 48)
  }

  test("unsupported and malformed shapes return None, never throw") {
    val good = encodeJpeg(gradient(16, 16, BufferedImage.TYPE_3BYTE_BGR), 0.9f)
    assert(JpegDecode.jpegPixels(good.take(20)).isEmpty)           // truncated header
    // truncated entropy stream: the bit reader refuses to decode its
    // synthesized zero-padding into plausible garbage — None, not Some
    assert(JpegDecode.jpegPixels(good.take(good.length - 30)).isEmpty)
    assert(JpegDecode.jpegPixels(Array[Byte](1, 2, 3)).isEmpty)    // not a JPEG
    assert(JpegDecode.jpegPixels(Array.fill[Byte](64)(0xff.toByte)).isEmpty)
    // MediaDecode dispatch picks it up
    assert(MediaDecode.imagePixels(good).isDefined)
  }

  test("single-component scan is non-interleaved: grayscale with 2x2 sampling factors") {
    // T.81 A.2: Ns=1 scans are NON-interleaved — one 8x8 block per MCU
    // in raster order, sampling factors ignored. jpegtran -grayscale
    // keeps the source's 4:2:0 luma factors, so this shape is common.
    // An 8x8 frame declaring h=v=2 carries exactly ONE block; an
    // (incorrect) interleaved read would demand 4 and hit the
    // truncation guard.
    def hex(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val jpeg = hex("FFD8" +
      "FFDB" + "0043" + "00" + "10" * 64 +
      "FFC0" + "000B" + "08" + "0008" + "0008" + "01" + "01" + "22" + "00" + // h=v=2
      "FFC4" + "0014" + "00" + "01" + "00" * 15 + "03" +
      "FFC4" + "0014" + "10" + "01" + "00" * 15 + "00" +
      "FFDA" + "0008" + "01" + "01" + "00" + "00" + "3F" + "00" +
      "57" + // DC code '0', +5 (101), EOB '0', 1-padded: 0101 0111
      "FFD9")
    val img = JpegDecode.jpegPixels(jpeg).getOrElse(fail("non-interleaved grayscale refused"))
    assert(img.width == 8 && img.height == 8 && img.channels == 1)
    assert(img.data.forall(b => (b & 0xff) == 138), s"got ${img.data.map(_ & 0xff).distinct.toSeq}")
  }

  test("stored-RGB JPEGs skip the YCbCr matrix (R,G,B component ids and Adobe transform=0)") {
    def hex(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // 8x8, 3 components, 1x1 sampling, DC-only; the single DC code maps
    // to category 3, so every block is 0|xxx|0: R=+5 -> 138,
    // G=+4 -> 136, B=-4 (011) -> 120. Entropy: 01010 01000 00110
    // + 1 one-pad = 0101 0010 0000 1101 = 0x52 0x0D
    def threeComp(ids: (Int, Int, Int), app14: String): Array[Byte] = hex("FFD8" +
      app14 +
      "FFDB" + "0043" + "00" + "10" * 64 +
      "FFC0" + "0011" + "08" + "0008" + "0008" + "03" +
      f"${ids._1}%02X" + "11" + "00" + f"${ids._2}%02X" + "11" + "00" + f"${ids._3}%02X" + "11" + "00" +
      "FFC4" + "0014" + "00" + "01" + "00" * 15 + "03" +
      "FFC4" + "0014" + "10" + "01" + "00" * 15 + "00" +
      "FFDA" + "000C" + "03" +
      f"${ids._1}%02X" + "00" + f"${ids._2}%02X" + "00" + f"${ids._3}%02X" + "00" +
      "00" + "3F" + "00" +
      "52" + "0D" + "FFD9")
    def checkRgbDirect(jpeg: Array[Byte]): Unit = {
      val img = JpegDecode.jpegPixels(jpeg).getOrElse(fail("stored-RGB refused"))
      assert(img.channels == 3)
      for (i <- 0 until 64) {
        assert((img.data(i * 3) & 0xff) == 138)     // R plane verbatim
        assert((img.data(i * 3 + 1) & 0xff) == 136) // G plane verbatim
        assert((img.data(i * 3 + 2) & 0xff) == 120) // B plane verbatim
      }
    }
    // 'R','G','B' component ids, no Adobe marker
    checkRgbDirect(threeComp((0x52, 0x47, 0x42), app14 = ""))
    // JFIF-style ids 1,2,3 but Adobe APP14 transform=0
    val adobe0 = "FFEE" + "000E" + "41646F6265" + "0064" + "0000" + "0000" + "00"
    checkRgbDirect(threeComp((1, 2, 3), app14 = adobe0))
    // control: same stream with ids 1,2,3 and NO Adobe marker is YCbCr
    // (DC Y=+5, Cb=+4, Cr=-4 -> R=127 after the matrix, not 138)
    val ycc = JpegDecode.jpegPixels(threeComp((1, 2, 3), app14 = "")).get
    assert((ycc.data(0) & 0xff) != 138)
    // Adobe transform=2 (YCCK) on 3 components is malformed -> None
    val adobe2 = "FFEE" + "000E" + "41646F6265" + "0064" + "0000" + "0000" + "02"
    assert(JpegDecode.jpegPixels(threeComp((1, 2, 3), app14 = adobe2)).isEmpty)
  }

  test("decompression bomb: huge claimed dims refused") {
    // SOF claims 60000x60000 (3.6 Gpx) — must refuse before allocating
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val bomb = hx("FFD8" + "FFDB" + "0043" + "00" + "10" * 64 +
      "FFC0" + "000B" + "08" + "EA60" + "EA60" + "01" + "01" + "11" + "00" +
      "FFD9")
    assert(JpegDecode.jpegPixels(bomb).isEmpty)
  }
}
