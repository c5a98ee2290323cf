package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Robustness fuzz for every binary-decode entry point: random
  * buffers, magic-prefixed random tails, random bit/byte flips of
  * valid fixtures, and every truncation prefix — the contract under
  * test is None-never-throw (a corrupt file at corpus scale must
  * degrade, never kill the task). Seeded Random, so a failure
  * reproduces; > 10⁴ mutated buffers per run.
  */
class DecoderFuzzSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** every decode entry point, by name (name shown on failure). */
  private val entryPoints: Seq[(String, Array[Byte] => Any)] = Seq(
    "imageDims" -> (b => MediaHeaders.imageDims(b)),
    "audioDurationMs" -> (b => MediaHeaders.audioDurationMs(b)),
    "videoDurationMs" -> (b => MediaHeaders.videoDurationMs(b)),
    "mp4Samples" -> (b => MediaHeaders.mp4Samples(b)),
    "pngPixels" -> (b => MediaDecode.pngPixels(b)),
    "bmpPixels" -> (b => MediaDecode.bmpPixels(b)),
    "jpegPixels" -> (b => JpegDecode.jpegPixels(b)),
    "gifPixels" -> (b => MediaDecode.gifPixels(b)),
    "tiffPixels" -> (b => MediaDecode.tiffPixels(b)),
    "vp8lPixels" -> (b => Vp8lDecode.vp8lPixels(b)),
    "vp8Pixels" -> (b => Vp8Decode.vp8Pixels(b)),
    "imagePixels" -> (b => MediaDecode.imagePixels(b)),
    "wavPcm16" -> (b => MediaDecode.wavPcm16(b)),
    "wavAdpcmSamples" -> (b => MediaDecode.wavAdpcmSamples(b)),
    "wavG711Samples" -> (b => MediaDecode.wavG711Samples(b)),
    "wavSamples" -> (b => MediaDecode.wavSamples(b)),
    "flacSamples" -> (b => FlacDecode.flacSamples(b)),
    "audioSamples" -> (b => MediaDecode.audioSamples(b)),
    "warcRecords" -> (b => WebArchive.warcRecords(b)),
    "exifMeta" -> (b => Exif.exifMeta(b)),
    "gunzip" -> (b => WebArchive.gunzip(b)),
    "dechunk" -> (b => WebArchive.dechunk(b, 0, b.length)),
    "inflate" -> (b => WebArchive.inflate(b)),
    "decodeTextEval" -> (b => graft.functions.Kernels.decodeTextEval(b)),
    "warcRecordsAny" -> (b => WebArchive.warcRecordsAny(b)),
    "unzstd" -> (b => WebArchive.unzstd(b)),
    "unzstdMembers" -> (b => WebArchive.unzstdMembers(b)),
    "memberRanges" -> (b => WebArchive.memberRanges(b)),
    "decodeMemberNoDict" -> (b => WebArchive.decodeMember(b, null)),
    "decodeMemberDict" -> (b => WebArchive.decodeMember(b, Array[Byte](87, 65, 82, 67))),
    "archiveDict" -> (b => WebArchive.archiveDict(b)))

  private def assertNoThrow(label: String, buf: Array[Byte]): Unit =
    entryPoints.foreach { case (name, f) =>
      try f(buf)
      catch {
        case e: Throwable =>
          fail(s"$name threw on $label (${buf.length} bytes, " +
            s"head ${buf.take(24).map("%02X".format(_)).mkString}): $e")
      }
    }

  /** valid fixtures spanning every format the decoders parse. */
  private lazy val fixtures: Seq[(String, Array[Byte])] = {
    // PNG needs real zlib: 2×2 RGB, filter 0 rows
    val raw = Array[Byte](0, 10, 20, 30, 40, 50, 60, 0, 70, 80, 90, 100, 110, 120)
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val zbuf = new Array[Byte](64)
    val zn = d.deflate(zbuf); d.end()
    val idat = zbuf.take(zn)
    def crc(tag: String, body: Array[Byte]): Array[Byte] = {
      val c = new java.util.zip.CRC32()
      c.update(tag.getBytes("ISO-8859-1")); c.update(body)
      val v = c.getValue
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    }
    def chunk(tag: String, body: Array[Byte]): Array[Byte] =
      Array(((body.length >> 24) & 0xff).toByte, ((body.length >> 16) & 0xff).toByte,
        ((body.length >> 8) & 0xff).toByte, (body.length & 0xff).toByte) ++
        tag.getBytes("ISO-8859-1") ++ body ++ crc(tag, body)
    val ihdr = hex("00000002" + "00000002" + "08" + "02" + "00" + "00" + "00")
    val png = hex("89504E470D0A1A0A") ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", idat) ++ chunk("IEND", Array.empty)
    // progressive JPEG: the JDK writer emits the standard SOF2 scan
    // script — fuzzing it covers the coefficient-buffered path
    val pimg = new java.awt.image.BufferedImage(19, 11, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val prnd = new scala.util.Random(0x9E1L)
    for (y <- 0 until 11; x <- 0 until 19)
      pimg.setRGB(x, y, (prnd.nextInt(256) << 16) | (prnd.nextInt(256) << 8) | prnd.nextInt(256))
    val pw = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val pout = new java.io.ByteArrayOutputStream()
    val pios = javax.imageio.ImageIO.createImageOutputStream(pout)
    pw.setOutput(pios)
    val pp = pw.getDefaultWriteParam
    pp.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    pw.write(null, new javax.imageio.IIOImage(pimg, null, null), pp)
    pw.dispose(); pios.close()
    Seq(
      "png" -> png,
      "jpeg_prog" -> pout.toByteArray,
      "bmp" -> hex("424D" + "46000000" + "00000000" + "36000000" +
        "28000000" + "02000000" + "02000000" + "0100" + "1800" + "00000000" +
        "10000000" + "00000000" + "00000000" + "00000000" + "00000000" +
        "FF0000" + "3264C8" + "0000" + "0000FF" + "00FF00" + "0000"),
      "jpeg" -> hex("FFD8" + "FFDB" + "0043" + "00" + "10" * 64 +
        "FFC0" + "000B" + "08" + "0008" + "0008" + "01011100" +
        "FFC4" + "0014" + "00" + "01" + "00" * 15 + "06" +
        "FFC4" + "0014" + "10" + "01" + "00" * 15 + "00" +
        "FFDA" + "0008" + "01" + "01" + "0000" + "3F00" + "58FFD9"),
      "wav_pcm" -> hex("524946462C00000057415645" +
        "666D7420100000000100010040 1F0000803E000002001000".replaceAll(" ", "") +
        "6461746108000000E80330F8B80B0080"),
      "wav_adpcm" -> hex("524946463000000057415645" +
        "666D74201400000011000100401F0000C71B00000800040002000900" +
        "6461746108000000E8030A00718F24F0"),
      "wav_pcm24x" -> hex("524946464800000057415645" +
        "666D742028000000FEFF0100401F0000C05D00000300180016001800" +
        "040000000100000000001000800000AA00389B71" +
        "646174610C000000" + "000040FFFFFF00008034129A"),
      "wav_mulaw" -> hex("524946462A00000057415645" +
        "666D74201200000007000100401F0000401F000001000800" + "0000" +
        "64617461040000000AFF6280"),
      "wav_alaw" -> hex("524946462A00000057415645" +
        "666D74201200000006000100401F0000401F000001000800" + "0000" +
        "6461746104000000" + "55D52AAA"),
      "gif" -> hex("474946383961" + "02000200" + "91" + "0000" +
        "FF0000" + "00FF00" + "0000FF" + "FF8040" +
        "2C" + "00000000" + "02000200" + "00" +
        "02" + "03" + "443405" + "00" + "3B"),
      "tiff_le" -> hex("49492A00" + "08000000" + "0800" +
        "00010300" + "01000000" + "02000000" +
        "01010300" + "01000000" + "02000000" +
        "02010300" + "01000000" + "08000000" +
        "03010300" + "01000000" + "01000000" +
        "06010300" + "01000000" + "01000000" +
        "11010400" + "01000000" + "6E000000" +
        "15010300" + "01000000" + "01000000" +
        "17010400" + "01000000" + "04000000" +
        "00000000" + "0AC83C5A"),
      "tiff_be" -> hex("4D4D002A000000080009" +
        "010000030000000100010000" + "010100030000000100020000" +
        "0102000300000003" + "0000007A" + "010300030000000100010000" +
        "010600030000000100020000" + "0111000400000002" + "00000080" +
        "011500030000000100030000" + "011600030000000100010000" +
        "0117000400000002" + "00000088" +
        "00000000" + "000800080008" + "0000009000000093" + "0000000300000003" +
        "FF0080010203"),
      "webp" -> hex("5249464618000000574542505650384C100000002F1000020000"),
      // decodable VP8L: the byte-aligned 2×2 mm_pixel_stats fixture
      "vp8l" -> hex("524946461A000000574542505650384C0E0000002F01400000869321D763B9FB1F9C"),
      // decodable lossy VP8: the smallest Vp8Golden fixture (1x1)
      "vp8" -> hex(Vp8Golden.all.find(_.name == "nf_flat1x1").get.webpHex),
      "flac" -> hex("664C614300000022001000100000000000000AC440000006BAA8"),
      // full decodable FLAC: STREAMINFO + one verbatim frame (mm_pixel_stats fixture 7)
      "flac_frame" -> hex("664C6143800000220004000400000000000001F400F000000004" +
        "00" * 16 + "FFF860080003B20203E8F8300BB880001795"),
      "mp3" -> hex("4944330300000000000A" + "00" * 10 + "FFFB9000" + "00" * 96),
      "mp4" -> hex("0000001066747970" + "69736F6D00000200" +
        "000000746D6F6F76" + "0000006C6D766864" +
        "00000000" + "00000000" + "00000000" + "00000258" + "00000BB8" + "00" * 80),
      "warc" -> ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://a.com/\r\n" +
        "Content-Length: 46\r\n\r\n" +
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nhi\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      "warc_gz" -> {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 2\r\n\r\nhi")
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        g.close()
        bos.toByteArray
      },
      "warc_zst" -> {
        // dictionary-frame form: skippable dict frame + one frame per record
        val rec = ("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        val dict = "WARC/1.0\r\nWARC-Type: ".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        val bos = new java.io.ByteArrayOutputStream()
        def le32(v: Int): Unit = {
          bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
          bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
        }
        le32(0x184D2A5D); le32(dict.length); bos.write(dict)
        val ctx = new com.github.luben.zstd.ZstdCompressCtx()
        try { ctx.setLevel(3); ctx.loadDict(dict); bos.write(ctx.compress(rec)) }
        finally ctx.close()
        bos.toByteArray
      })
  }

  test("fixtures decode as themselves (fuzz baseline is live)") {
    assert(MediaDecode.pngPixels(fixtures.toMap.apply("png")).isDefined)
    assert(MediaDecode.bmpPixels(fixtures.toMap.apply("bmp")).isDefined)
    assert(JpegDecode.jpegPixels(fixtures.toMap.apply("jpeg")).isDefined)
    assert(JpegDecode.jpegPixels(fixtures.toMap.apply("jpeg_prog")).isDefined)
    assert(MediaDecode.wavPcm16(fixtures.toMap.apply("wav_pcm")).isDefined)
    assert(MediaDecode.wavAdpcmSamples(fixtures.toMap.apply("wav_adpcm")).isDefined)
    assert(MediaDecode.wavG711Samples(fixtures.toMap.apply("wav_mulaw")).isDefined)
    assert(MediaDecode.wavG711Samples(fixtures.toMap.apply("wav_alaw")).isDefined)
    assert(MediaDecode.gifPixels(fixtures.toMap.apply("gif")).isDefined)
    assert(MediaDecode.tiffPixels(fixtures.toMap.apply("tiff_le")).isDefined)
    assert(MediaDecode.tiffPixels(fixtures.toMap.apply("tiff_be")).isDefined)
    assert(Vp8lDecode.vp8lPixels(fixtures.toMap.apply("vp8l")).isDefined)
    assert(Vp8Decode.vp8Pixels(fixtures.toMap.apply("vp8")).isDefined)
    assert(MediaHeaders.imageDims(fixtures.toMap.apply("gif")).isDefined)
    assert(MediaHeaders.audioDurationMs(fixtures.toMap.apply("flac")).isDefined)
    assert(FlacDecode.flacSamples(fixtures.toMap.apply("flac_frame")).isDefined)
    assert(MediaHeaders.videoDurationMs(fixtures.toMap.apply("mp4")).isDefined)
    assert(WebArchive.warcRecords(fixtures.toMap.apply("warc")).exists(_.head.httpStatus == 200))
    assert(WebArchive.warcRecordsAny(fixtures.toMap.apply("warc_zst"))
      .exists(_._2.head.warcType == "resource"))
    assert(WebArchive.warcRecordsAny(fixtures.toMap.apply("warc_gz"))
      .exists(_._2.head.warcType == "resource"))
  }

  test("random buffers never throw (4000 buffers)") {
    val rnd = new scala.util.Random(0xF00DL)
    for (i <- 0 until 4000) {
      val buf = new Array[Byte](rnd.nextInt(513))
      rnd.nextBytes(buf)
      assertNoThrow(s"random#$i", buf)
    }
  }

  test("magic-prefixed random tails never throw (3000 buffers)") {
    val rnd = new scala.util.Random(0xBEEFL)
    val magics = Seq(
      hex("89504E470D0A1A0A"), hex("424D"), hex("FFD8FF"),
      "RIFF".getBytes ++ hex("24000000") ++ "WAVE".getBytes,
      "RIFF".getBytes ++ hex("24000000") ++ "WEBP".getBytes,
      "GIF89a".getBytes, "GIF87a".getBytes, "fLaC".getBytes,
      hex("49492A00"), hex("4D4D002A"),
      "ID3".getBytes, hex("FFFB"), hex("0000001066747970"))
    for (i <- 0 until 3000) {
      val magic = magics(rnd.nextInt(magics.length))
      val tail = new Array[Byte](rnd.nextInt(257))
      rnd.nextBytes(tail)
      assertNoThrow(s"magic#$i", magic ++ tail)
    }
  }

  test("bit-flipped valid fixtures never throw (500 mutants per format)") {
    val rnd = new scala.util.Random(0xCAFEL)
    fixtures.foreach { case (name, fix) =>
      for (i <- 0 until 500) {
        val m = fix.clone()
        val flips = 1 + rnd.nextInt(8)
        for (_ <- 0 until flips) {
          val at = rnd.nextInt(m.length)
          m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
        }
        assertNoThrow(s"$name-flip#$i", m)
      }
    }
  }

  test("byte-scrambled valid fixtures never throw (300 mutants per format)") {
    val rnd = new scala.util.Random(0xD00DL)
    fixtures.foreach { case (name, fix) =>
      for (i <- 0 until 300) {
        val m = fix.clone()
        for (_ <- 0 to rnd.nextInt(6)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        assertNoThrow(s"$name-scramble#$i", m)
      }
    }
  }

  test("every truncation prefix of every fixture never throws") {
    fixtures.foreach { case (name, fix) =>
      for (n <- 0 to fix.length)
        assertNoThrow(s"$name-trunc$n", fix.take(n))
    }
  }

  test("truncated-then-extended fixtures never throw (zero and 0xFF padding)") {
    fixtures.foreach { case (name, fix) =>
      for (cut <- Seq(fix.length / 3, fix.length / 2, fix.length - 4); pad <- Seq(0x00, 0xff)) {
        val m = fix.take(cut) ++ Array.fill(64)(pad.toByte)
        assertNoThrow(s"$name-extend$cut-$pad", m)
      }
    }
  }
}
