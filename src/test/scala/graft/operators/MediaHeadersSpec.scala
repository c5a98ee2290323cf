package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level header parsing: the variable-position JPEG scan, WAV
  * chunk walk with alignment, and every malformed-input None path (a
  * 100 TB corpus WILL contain truncated files — nothing may throw).
  */
class MediaHeadersSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("PNG: IHDR dims; truncated signature rejected") {
    val png = hex("89504E470D0A1A0A 0000000D 49484452 00000140 000000C8 0802000000")
    assert(MediaHeaders.imageDims(png).contains((320L, 200L)))
    assert(MediaHeaders.imageDims(png.take(20)).isEmpty) // < 24 bytes
    assert(MediaHeaders.imageDims(hex("88504E470D0A1A0A" + "00" * 16)).isEmpty) // bad sig
  }

  test("GIF: 87a and 89a little-endian dims") {
    assert(MediaHeaders.imageDims(hex("474946383961 0C00 2200 F7000000"))
      .contains((12L, 34L)))
    assert(MediaHeaders.imageDims(hex("474946383761 FF01 0300 00000000"))
      .contains((511L, 3L)))
    assert(MediaHeaders.imageDims(hex("474946383861 0C00 2200 F7000000")).isEmpty) // GIF88a
  }

  test("JPEG: SOF found behind APP/DQT segments, fill bytes, restart markers") {
    // FFD8, APP1, RST0 standalone, DHT (len 4, must be SKIPPED, not
    // parsed as a frame), then a progressive SOF2
    val jpeg = hex("FFD8" + "FFE10004" + "0000" + // APP1 len 4 (2 payload)
      "FFD0" +                                     // restart marker, standalone
      "FFC40004" + "0000" +                        // DHT len 4 — not a frame
      "FFC2000B" + "08" + "0064" + "00C8" + "03" + "000000" + // SOF2: h=100 w=200
      "FFD9")
    assert(MediaHeaders.imageDims(jpeg).contains((200L, 100L)))
    // lost sync (segment points past a non-FF byte) -> None, no throw
    assert(MediaHeaders.imageDims(hex("FFD8 00C0 0011")).isEmpty)
    // truncated before any SOF -> None
    assert(MediaHeaders.imageDims(hex("FFD8 FFE10004 00")).isEmpty)
  }

  test("WAV: chunk walk honors 2-byte alignment and chunk order") {
    // RIFF/WAVE with an ODD-sized junk chunk before fmt: the walk must
    // skip its pad byte to stay aligned
    val wav = hex("52494646" + "30000000" + "57415645" +
      "4A554E4B" + "03000000" + "AABBCC" + "00" + // 'JUNK' size 3 + pad
      "666D7420" + "10000000" + "0100" + "0100" + "401F0000" + "401F0000" + "0200" + "1000" +
      "64617461" + "08000000" + "00" * 8)
    assert(MediaHeaders.wavDurationMs(wav).contains(1L)) // 8*1000/8000
    // missing fmt -> None; foreign container -> None; truncated -> None
    val noFmt = hex("52494646" + "10000000" + "57415645" + "64617461" + "04000000" + "00" * 4)
    assert(MediaHeaders.wavDurationMs(noFmt).isEmpty)
    assert(MediaHeaders.wavDurationMs(hex("4F676753" + "00" * 40)).isEmpty)
    assert(MediaHeaders.wavDurationMs(wav.take(30)).isEmpty)
  }

  test("WebP: all three container flavors at their spec'd offsets") {
    // VP8X extended: canvas stored −1 as LE24 pairs
    val vp8x = hex("52494646" + "24000000" + "57454250" + "56503858" + "0A000000" +
      "00000000" + "2B0100" + "C70000")
    assert(MediaHeaders.imageDims(vp8x).contains((300L, 200L)))
    // VP8 lossy: keyframe sync 9D 01 2A then 14-bit dims
    val vp8 = hex("52494646" + "20000000" + "57454250" + "56503820" + "12000000" +
      "000000" + "9D012A" + "8002" + "E001")
    assert(MediaHeaders.imageDims(vp8).contains((640L, 480L)))
    // VP8L lossless: 0x2F signature then packed 14-bit fields, stored −1
    val vp8l = hex("52494646" + "18000000" + "57454250" + "5650384C" + "10000000" +
      "2F" + "10000200" + "00")
    assert(MediaHeaders.imageDims(vp8l).contains((17L, 9L)))
    // bad lossy sync -> None
    val badSync = hex("52494646" + "20000000" + "57454250" + "56503820" + "12000000" +
      "000000" + "9D012B" + "8002" + "E001")
    assert(MediaHeaders.imageDims(badSync).isEmpty)
  }

  test("BMP: LE dims; negative (top-down) height reported absolute") {
    val bmp = hex("424D" + "46000000" + "00000000" + "36000000" + "28000000" +
      "40010000" + "0C000000")
    assert(MediaHeaders.imageDims(bmp).contains((320L, 12L)))
    val topDown = hex("424D" + "46000000" + "00000000" + "36000000" + "28000000" +
      "40010000" + "F4FFFFFF")
    assert(MediaHeaders.imageDims(topDown).contains((320L, 12L)))
  }

  test("BMP: BITMAPCOREHEADER u16 dims; unknown DIB header size rejected") {
    // 12-byte core header: u16 width/height at 18/20
    val core = hex("424D" + "1E000000" + "00000000" + "1A000000" + "0C000000" +
      "4001" + "0C00")
    assert(MediaHeaders.imageDims(core).contains((320L, 12L)))
    // DIB size 32 is no real header — must be None, not garbage dims
    val unknown = hex("424D" + "46000000" + "00000000" + "36000000" + "20000000" +
      "40010000" + "0C000000")
    assert(MediaHeaders.imageDims(unknown).isEmpty)
  }

  test("FLAC: STREAMINFO rate/total-samples -> duration") {
    // 44100 Hz, 441000 samples -> exactly 10 s
    val flac = hex("664C6143" + "00" + "000022" + "00100010000000000000" +
      "0A" + "C4" + "40" + "00" + "0006BAA8")
    assert(MediaHeaders.flacDurationMs(flac).contains(10000L))
    assert(MediaHeaders.audioDurationMs(flac).contains(10000L))
    // first block not STREAMINFO -> None; foreign bytes -> None
    val wrongBlock = hex("664C6143" + "04" + "000022" + "00100010000000000000" +
      "0A" + "C4" + "40" + "00" + "0006BAA8")
    assert(MediaHeaders.flacDurationMs(wrongBlock).isEmpty)
    assert(MediaHeaders.flacDurationMs(hex("DEADBEEF" + "00" * 30)).isEmpty)
  }

  test("MP3: CBR duration behind an ID3v2 tag; VBR-adjacent shapes rejected") {
    // ID3v2 tag of 10 bytes payload, then an MPEG1-L3 header at 128
    // kbps followed by 96 payload bytes: audio = 100 bytes -> 6 ms
    val mp3 = hex("494433030000" + "0000000A" + "00" * 10 +
      "FFFB9000" + "00" * 96)
    assert(MediaHeaders.mp3DurationMs(mp3).contains(100L * 8 / 128))
    assert(MediaHeaders.audioDurationMs(mp3).contains(6L))
    // bare frame with no tag
    val bare = hex("FFFB1000" + "00" * 60) // 32 kbps, 64 bytes -> 16 ms
    assert(MediaHeaders.mp3DurationMs(bare).contains(16L))
    // MPEG2 (version bits 10) and free-format bitrate -> None
    assert(MediaHeaders.mp3DurationMs(hex("FFF39000" + "00" * 60)).isEmpty)
    assert(MediaHeaders.mp3DurationMs(hex("FFFB0000" + "00" * 60)).isEmpty)
    // tag pointing past the buffer -> None, no throw
    assert(MediaHeaders.mp3DurationMs(hex("494433030000" + "00000F7F")).isEmpty)
  }

  test("MP3: Xing/Info VBR header frames never use the lying bitrate; trailing ID3v1 excluded") {
    // stereo frame (mode bits 00): side info 32 bytes, Xing at header+36;
    // flags=0 → no frame count recorded → None, not a wrong CBR number
    val xingStereo = hex("FFFB9000" + "00" * 32 + "58696E67" + "00" * 20)
    assert(MediaHeaders.mp3DurationMs(xingStereo).isEmpty)
    // 'Info' marker (CBR-written LAME header) is still a header frame
    val infoStereo = hex("FFFB9000" + "00" * 32 + "496E666F" + "00" * 20)
    assert(MediaHeaders.mp3DurationMs(infoStereo).isEmpty)
    // mono frame (mode bits 11): side info 17 bytes, Xing at header+21
    val xingMono = hex("FFFB90C0" + "00" * 17 + "58696E67" + "00" * 20)
    assert(MediaHeaders.mp3DurationMs(xingMono).isEmpty)
    // same bytes WITHOUT the marker parse as CBR again
    val cbrMono = hex("FFFB90C0" + "00" * 41)
    assert(MediaHeaders.mp3DurationMs(cbrMono).contains(45L * 8 / 128))
    // trailing 128-byte ID3v1 'TAG' block is metadata, not audio
    val tagged = hex("FFFB1000" + "00" * 60 + "544147" + "00" * 125)
    assert(MediaHeaders.mp3DurationMs(tagged).contains(16L)) // 64 audio bytes
  }

  test("MP3: VBR duration from the Xing frame count") {
    // stereo 44.1 kHz (rate bits 00): flags=1, frames=1000
    // → 1000 × 1152 / 44100 = 26122 ms
    val vbr = hex("FFFB9000" + "00" * 32 + "58696E67" + "00000001" + "000003E8" + "00" * 8)
    assert(MediaHeaders.mp3DurationMs(vbr).contains(1000L * 1152L * 1000L / 44100L))
    // 48 kHz (rate bits 01 → header byte2 = 0x94): 1000 × 1152 / 48000 = 24000 ms
    val vbr48 = hex("FFFB9400" + "00" * 32 + "58696E67" + "00000001" + "000003E8" + "00" * 8)
    assert(MediaHeaders.mp3DurationMs(vbr48).contains(24000L))
    // mono Xing with a frame count also resolves
    val vbrMono = hex("FFFB90C0" + "00" * 17 + "58696E67" + "00000001" + "00000064" + "00" * 8)
    assert(MediaHeaders.mp3DurationMs(vbrMono).contains(100L * 1152L * 1000L / 44100L))
    // truncated right after the marker → None, no throw
    assert(MediaHeaders.mp3DurationMs(hex("FFFB9000" + "00" * 32 + "58696E67")).isEmpty)
    // CRC-protected frame (protection bit 0, header FFFA): 2 CRC bytes
    // sit before the side info, so Xing is at header+2+36 — the marker
    // must still be found, not mistaken for a CBR stream
    val vbrCrc = hex("FFFA9000" + "0000" + "00" * 32 + "58696E67" + "00000001" + "000003E8" + "00" * 8)
    assert(MediaHeaders.mp3DurationMs(vbrCrc).contains(1000L * 1152L * 1000L / 44100L))
  }

  test("MP4/MOV: mvhd duration, both versions, largesize and foreign bytes") {
    def box(typ: String, payloadHex: String): String = {
      val size = 8 + payloadHex.length / 2
      f"$size%08X" + typ.getBytes("ISO-8859-1").map("%02X".format(_)).mkString + payloadHex
    }
    // mvhd v0: version+flags, ctime, mtime, timescale=600, duration=3000 → 5000 ms
    val mvhd0 = box("mvhd", "00000000" + "00000000" + "00000000" + "00000258" + "00000BB8" + "00" * 80)
    val ftyp = box("ftyp", "69736F6D" + "00000200")
    val mp4 = hex(ftyp + box("moov", mvhd0))
    assert(MediaHeaders.mp4DurationMs(mp4).contains(5000L))
    assert(MediaHeaders.videoDurationMs(mp4).contains(5000L))
    assert(MediaHeaders.audioDurationMs(mp4).contains(5000L)) // m4a path
    // mvhd v1: u64 ctime/mtime, timescale=1000 at +20, u64 duration=90000 → 90 s
    val mvhd1 = box("mvhd", "01000000" + "00" * 16 + "000003E8" + "0000000000015F90" + "00" * 80)
    assert(MediaHeaders.mp4DurationMs(hex(ftyp + box("moov", mvhd1))).contains(90000L))
    // moov AFTER a skipped mdat box, and moov declared with size==1 largesize
    val moovPayload = mvhd0
    val moovLarge = "00000001" + "6D6F6F76" + f"${16 + moovPayload.length / 2}%016X" + moovPayload
    val mdat = box("mdat", "AA" * 12)
    assert(MediaHeaders.mp4DurationMs(hex(ftyp + mdat + moovLarge)).contains(5000L))
    // foreign bytes / corrupt sizes → None, no throw, no infinite walk
    assert(MediaHeaders.mp4DurationMs(hex("00" * 32)).isEmpty)
    assert(MediaHeaders.mp4DurationMs(hex(box("ftyp", "69736F6D") + "00000003" + "6D6F6F76")).isEmpty)
    assert(MediaHeaders.mp4DurationMs(hex(ftyp)).isEmpty) // no moov at all
    // zero timescale cannot divide
    val mvhdZero = box("mvhd", "00000000" + "00000000" + "00000000" + "00000000" + "00000BB8" + "00" * 80)
    assert(MediaHeaders.mp4DurationMs(hex(ftyp + box("moov", mvhdZero))).isEmpty)
    // all-ones duration = the spec's "unknown" sentinel (fragmented
    // files) → None, not a ~49-day fabrication
    val mvhdUnk0 = box("mvhd", "00000000" + "00000000" + "00000000" + "00000258" + "FFFFFFFF" + "00" * 80)
    assert(MediaHeaders.mp4DurationMs(hex(ftyp + box("moov", mvhdUnk0))).isEmpty)
    val mvhdUnk1 = box("mvhd", "01000000" + "00" * 16 + "000003E8" + "FFFFFFFFFFFFFFFF" + "00" * 80)
    assert(MediaHeaders.mp4DurationMs(hex(ftyp + box("moov", mvhdUnk1))).isEmpty)
    // duration ZERO = fragmented-file convention (real total lives in
    // mvex/mehd) → None, not a fabricated 0 ms a duration floor would
    // drop every DASH/fMP4 file on
    val mvhdFrag0 = box("mvhd", "00000000" + "00000000" + "00000000" + "00000258" + "00000000" + "00" * 80)
    assert(MediaHeaders.mp4DurationMs(hex(ftyp + box("moov", mvhdFrag0))).isEmpty)
    val mvhdFrag1 = box("mvhd", "01000000" + "00" * 16 + "000003E8" + "0000000000000000" + "00" * 80)
    assert(MediaHeaders.mp4DurationMs(hex(ftyp + box("moov", mvhdFrag1))).isEmpty)
  }

  test("FLAC: total-samples 0 is the spec's 'unknown' -> None, not 0 ms") {
    // STREAMINFO with rate 44100 but zero total samples (live capture)
    val flacUnknown = hex("664C614300000022001000100000000000000AC440" + "0000000000")
    assert(MediaHeaders.flacDurationMs(flacUnknown).isEmpty)
    // the known fixture still resolves: 441000 samples at 44100 Hz
    val flacKnown = hex("664C614300000022001000100000000000000AC440000006BAA8")
    assert(MediaHeaders.flacDurationMs(flacKnown).contains(10000L))
  }

  test("assemble→parse round-trips across the dimension range") {
    def px(v: Long, n: Int): String = ("%0" + (2 * n) + "X").format(v) // big-endian
    def le(v: Long, n: Int): String =
      (0 until n).map(i => "%02X".format((v >> (8 * i)) & 0xff)).mkString
    for (w <- Seq(1L, 7L, 255L, 256L, 65535L); h <- Seq(1L, 199L, 65535L)) {
      val png = hex("89504E470D0A1A0A0000000D49484452" + px(w, 4) + px(h, 4) + "0802000000")
      assert(MediaHeaders.imageDims(png).contains((w, h)), s"png $w x $h")
      val gif = hex("474946383961" + le(w.min(65535L), 2) + le(h.min(65535L), 2) + "00000000")
      assert(MediaHeaders.imageDims(gif).contains((w.min(65535L), h.min(65535L))), s"gif $w x $h")
      val jpg = hex("FFD8" + "FFC0000B08" + px(h, 2) + px(w, 2) + "03000000" + "FFD9")
      assert(MediaHeaders.imageDims(jpg).contains((w, h)), s"jpeg $w x $h")
    }
    for (rate <- Seq(1L, 8000L, 192000L); dlen <- Seq(0L, 16L, 1000L)) {
      val wav = hex("52494646" + le(36 + dlen, 4) + "57415645" +
        "666D74201000000001000100" + le(8000L, 4) + le(rate, 4) + "02001000" +
        "64617461" + le(dlen, 4) + "00" * dlen.toInt)
      assert(MediaHeaders.wavDurationMs(wav).contains(dlen * 1000L / rate),
        s"wav rate=$rate dlen=$dlen")
    }
  }

  test("HeaderCodec: real parse for known formats, stub fallback for foreign bytes") {
    val codec = new Multimodal.HeaderCodec(4)
    val png = hex("89504E470D0A1A0A 0000000D 49484452 00000010 00000020 0802000000")
    val out = codec.decode(Iterator(
      Multimodal.MediaRow(1L, "image", png),
      Multimodal.MediaRow(2L, "image", hex("DEADBEEF")),
      Multimodal.MediaRow(3L, "audio", hex("DEADBEEF")))).toList
    assert(out(0).width == 16L && out(0).height == 32L)
    assert(out(1).width == (4 % 64 + 1) * 16L) // stub fallback
    assert(out(2).duration_ms == 4L * 40)      // stub audio fallback
  }

  test("mp4Samples: stts/stsz/stsc/stco walk, per-sample sizes, two chunks") {
    import MediaHeaders.Mp4Sample
    // mm_mp4_samples fixture 1: timescale 1000, sizes 10..50, chunks
    // at 200 (2 samples) and 300 (3 samples), deltas 100,100,200,200,200
    val a = hex(
      "000000106674797069736F6D000002000000013C6D6F6F760000006C6D766864" +
        "0000000000000000000000000000025800000BB8" + "00" * 80 +
        "000000C87472616B000000C06D646961000000206D646864000000000000000000000000" +
        "000003E80000138800000000000000986D696E66000000907374626C" +
        "0000002073747473000000000000000200000002000000640000000300000" +
        "0C800000028737473630000000000000002000000010000000200000001000000020000" +
        "000300000001000000287374737A0000000000000000000000050000000A000000140000" +
        "001E0000002800000032000000187374636F0000000000000002000000C80000012C")
    // no ctts, no stss → the normative defaults: pts = dts, all sync
    assert(MediaHeaders.mp4Samples(a).contains(Vector(
      Mp4Sample(0, 200, 10, 0, 0, true), Mp4Sample(1, 210, 20, 100, 100, true),
      Mp4Sample(2, 300, 30, 200, 200, true), Mp4Sample(3, 330, 40, 400, 400, true),
      Mp4Sample(4, 370, 50, 600, 600, true))))
    // every truncation prefix: None, never a throw
    (0 until a.length).foreach(n => assert(MediaHeaders.mp4Samples(a.take(n)).isEmpty))
  }

  test("mp4Samples: constant sizes, co64 offsets, v1 mdhd timescale") {
    import MediaHeaders.Mp4Sample
    val b = hex(
      "000000106674797069736F6D00000200000001206D6F6F760000006C6D766864" +
        "0000000000000000000000000000025800000BB8" + "00" * 80 +
        "000000AC7472616B000000A46D6469610000002C6D646864010000000000000000000000" +
        "000000000000000000015F90000000000002BF2000000000000000706D696E6600000068" +
        "7374626C0000001873747473000000000000000100000004000001F40000001C73747363" +
        "0000000000000001000000010000000400000001000000147374737A0000000000000019" +
        "0000000400000018636F3634000000000000000100000000000003E8")
    assert(MediaHeaders.mp4Samples(b).contains(Vector(
      Mp4Sample(0, 1000, 25, 0, 0, true), Mp4Sample(1, 1025, 25, 5, 5, true),
      Mp4Sample(2, 1050, 25, 11, 11, true), Mp4Sample(3, 1075, 25, 16, 16, true))))
    // inconsistent tables reject: fewer time runs than samples (patch
    // the stts run count from 4 down to 2), zero timescale
    val shortTime = b.clone()
    shortTime(227) = 2 // stts run sample count low byte (payload 216 + 11)
    assert(MediaHeaders.mp4Samples(shortTime).isEmpty)
    val zeroTs = b.clone()
    java.util.Arrays.fill(zeroTs, 176, 180, 0.toByte) // v1 timescale bytes
    assert(MediaHeaders.mp4Samples(zeroTs).isEmpty)
    // duration-only MP4 (no stbl) and foreign bytes: None
    assert(MediaHeaders.mp4Samples(hex("0000001066747970" + "69736F6D00000200" +
      "000000746D6F6F76" + "0000006C6D766864" +
      "00000000" + "00000000" + "00000000" + "00000258" + "00000BB8" + "00" * 80)).isEmpty)
    assert(MediaHeaders.mp4Samples(hex("DEADBEEF")).isEmpty)
  }

  test("mp4Samples: ctts v0 composition offsets + stss sync membership") {
    import MediaHeaders.Mp4Sample
    // mm_frame_select_key fixture C: timescale 1000, one stts run
    // 8×100, ctts v0 runs (1,0)(1,250)(2,0)(1,250)(3,0), stss [1,5,7],
    // constant size 100, one chunk at 1024
    val c = hex(
      "000000106674797069736F6D00000200000001646D6F6F760000006C6D766864" +
        "0000000000000000000000000000025800000BB8" + "00" * 80 +
        "000000F07472616B000000E86D646961000000206D646864000000000000000000000000" +
        "000003E80000138800000000000000C06D696E66000000B87374626C" +
        "000000187374747300000000000000010000000800000064" +
        "0000003863747473000000000000000500000001000000000000000100" +
        "0000FA000000020000000000000001000000FA0000000300000000" +
        "0000001C7374737300000000000000030000000100000005000000070000001C" +
        "737473630000000000000001000000010000000800000001" +
        "000000147374737A000000000000006400000008" +
        "000000147374636F0000000000000001" + "00000400")
    val expectPts = Seq(0L, 350L, 200L, 300L, 650L, 500L, 600L, 700L)
    val expectSync = Set(0, 4, 6)
    assert(MediaHeaders.mp4Samples(c).contains((0 until 8).map(k =>
      Mp4Sample(k, 1024L + 100L * k, 100L, 100L * k, expectPts(k),
        expectSync.contains(k))).toVector))
    // every truncation prefix: None, never a throw
    (0 until c.length).foreach(n => assert(MediaHeaders.mp4Samples(c.take(n)).isEmpty))
    // inconsistent optional tables reject:
    val nonIncreasing = c.clone()
    nonIncreasing(299) = 1 // stss entry 2: 5 -> 1 (not strictly increasing)
    assert(MediaHeaders.mp4Samples(nonIncreasing).isEmpty)
    val outOfRange = c.clone()
    outOfRange(303) = 9 // stss entry 3: 7 -> 9 (> nSamples = 8)
    assert(MediaHeaders.mp4Samples(outOfRange).isEmpty)
    val shortCtts = c.clone()
    shortCtts(235) = 4 // ctts run count 5 -> 4: covers 5 of 8 samples
    assert(MediaHeaders.mp4Samples(shortCtts).isEmpty)
    val badVersion = c.clone()
    badVersion(228) = 2 // ctts version 2 is not a thing
    assert(MediaHeaders.mp4Samples(badVersion).isEmpty)
  }

  test("mp4Samples: ctts v1 signed (negative) offsets, absent stss = all sync") {
    import MediaHeaders.Mp4Sample
    // mm_frame_select_key fixture D: timescale 1000, one stts run
    // 4×200, ctts v1 runs (1,0)(2,−100)(1,+100), no stss, constant
    // size 50, one chunk at 2048
    val d = hex(
      "000000106674797069736F6D00000200000001386D6F6F760000006C6D766864" +
        "0000000000000000000000000000025800000BB8" + "00" * 80 +
        "000000C47472616B000000BC6D646961000000206D646864000000000000000000000000" +
        "000003E80000138800000000000000946D696E660000008C7374626C" +
        "0000001873747473000000000000000100000004000000C8" +
        "0000002863747473010000000000000300000001000000000000" +
        "0002FFFFFF9C0000000100000064" +
        "0000001C737473630000000000000001000000010000000400000001" +
        "000000147374737A000000000000003200000004" +
        "000000147374636F0000000000000001" + "00000800")
    assert(MediaHeaders.mp4Samples(d).contains(Vector(
      Mp4Sample(0, 2048, 50, 0, 0, true), Mp4Sample(1, 2098, 50, 200, 100, true),
      Mp4Sample(2, 2148, 50, 400, 300, true), Mp4Sample(3, 2198, 50, 600, 700, true))))
    // the same stream with ctts downgraded to v0 must read 0xFFFFFF9C
    // as UNSIGNED +4294967196 — proving the v1 path is signed, not a
    // coincidence of small offsets (pts_ms floors 4294967196+dts ticks)
    val v0 = d.clone()
    v0(228) = 0
    val got = MediaHeaders.mp4Samples(v0).get
    assert(got(1).ptsMs == (200L + 4294967196L) * 1000L / 1000L)
    assert(got(1).isSync && got(3).ptsMs == 700L)
  }

  // generated fixtures (tools-free struct packing, offsets in the
  // mm_mp4_samples_elst oracle comments): movie ts 600, media ts
  // 1000, one stts run 5×100, const stsz 20, one chunk at 200
  private val elstV0 = // empty edit (300 movie units) + head trim 250
    "000000106674797069736F6D00000200000001406D6F6F760000006C6D7668640000000000000000000000000000025800000BB80000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000CC7472616B000000306564747300000028656C737400000000000000020000012CFFFFFFFF00010000000002BC000000FA00010000000000946D646961000000206D646864000000000000000000000000000003E800001388000000000000006C6D696E66000000647374626C0000001873747473000000000000000100000005000000640000001C737473630000000000000001000000010000000500000001000000147374737A000000000000001400000005000000147374636F0000000000000001000000C8"
  private val elstV1 = // v1 64-bit single edit, media_time 500
    "000000106674797069736F6D000002000000013C6D6F6F760000006C6D7668640000000000000000000000000000025800000BB80000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000C87472616B0000002C6564747300000024656C7374010000000000000100000000000002BC00000000000001F400010000000000946D646961000000206D646864000000000000000000000000000003E800001388000000000000006C6D696E66000000647374626C0000001873747473000000000000000100000005000000640000001C737473630000000000000001000000010000000500000001000000147374737A000000000000001400000005000000147374636F0000000000000001000000C8"
  private val elstBad = // claims 2 entries, carries 1 (truncated)
    "000000106674797069736F6D00000200000001346D6F6F760000006C6D7668640000000000000000000000000000025800000BB80000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000C07472616B00000024656474730000001C656C73740000000000000002000002BC000000FA00010000000000946D646961000000206D646864000000000000000000000000000003E800001388000000000000006C6D696E66000000647374626C0000001873747473000000000000000100000005000000640000001C737473630000000000000001000000010000000500000001000000147374737A000000000000001400000005000000147374636F0000000000000001000000C8"

  test("mp4Samples applyEdits: empty-edit delay + head trim shift pts; dts/sync stay raw") {
    val b = hex(elstV0)
    // raw parse ignores the edit list entirely
    assert(MediaHeaders.mp4Samples(b).get.map(_.ptsMs) == Vector(0L, 100L, 200L, 300L, 400L))
    // delay = 300 movie units @600 = 500 ms; trim = 250 media units
    val ed = MediaHeaders.mp4Samples(b, applyEdits = true).get
    assert(ed.map(_.ptsMs) == Vector(250L, 350L, 450L, 550L, 650L))
    assert(ed.map(_.dtsMs) == Vector(0L, 100L, 200L, 300L, 400L))
    assert(ed.forall(_.isSync) && ed.map(_.offset) == Vector(200L, 220L, 240L, 260L, 280L))
  }

  test("mp4Samples applyEdits: v1 64-bit entries; head trim makes early pts negative (floor)") {
    val ed = MediaHeaders.mp4Samples(hex(elstV1), applyEdits = true).get
    assert(ed.map(_.ptsMs) == Vector(-500L, -400L, -300L, -200L, -100L))
  }

  test("mp4Samples applyEdits: malformed elst rejects; without applyEdits it parses raw") {
    val b = hex(elstBad)
    assert(MediaHeaders.mp4Samples(b, applyEdits = true).isEmpty)
    assert(MediaHeaders.mp4Samples(b).get.length == 5) // reject is edit-specific
  }

  test("mp4Samples applyEdits: crafted 2^60-unit elst durations reject, never overflow to garbage pts") {
    // elstV1's segment_duration u64 sits at payload+8 (offset 164 in
    // the file): overwrite with 2^60 — past the 2^50 sanity bound
    val b = hex(elstV1)
    b(164) = 0x10.toByte // big-endian top byte → 2^50 bound trips
    assert(MediaHeaders.mp4Samples(b, applyEdits = true).isEmpty)
    // same bound on a v1 media_time (payload+16 → offset 172)
    val c = hex(elstV1)
    c(172) = 0x10.toByte
    assert(MediaHeaders.mp4Samples(c, applyEdits = true).isEmpty)
  }

  // ---- multi-segment splice lists + media_rate: the same skeleton
  //      as elstV0 (movie ts 600, media ts 1000, one stts run 5×100
  //      → raw pts 0,100,200,300,400; const size 20, chunk at 200)
  //      with a PARAMETERIZED elst, assembled programmatically. ----

  /** full MP4 with an elst of `entries` = (segment_duration[movie],
    * media_time[-1 empty], media_rate_integer, media_rate_fraction). */
  private def elstFile(entries: Seq[(Long, Long, Int, Int)]): Array[Byte] = {
    def box(typ: String, payloadHex: String): String = {
      val size = 8 + payloadHex.length / 2
      f"$size%08X" + typ.getBytes("ISO-8859-1").map("%02X".format(_)).mkString + payloadHex
    }
    def u32(v: Long): String = f"${v & 0xFFFFFFFFL}%08X"
    def u16(v: Int): String = f"${v & 0xFFFF}%04X"
    val elst = box("elst", "00000000" + u32(entries.length) +
      entries.map { case (dur, mt, ri, rf) =>
        u32(dur) + u32(mt) + u16(ri) + u16(rf)
      }.mkString)
    val mvhd = box("mvhd", "00000000" + "00000000" + "00000000" + "00000258" +
      "00000BB8" + "00" * 80)
    val mdhd = box("mdhd", "00000000" + "00000000" + "00000000" + "000003E8" +
      "00001388" + "00000000")
    val stbl = box("stbl",
      box("stts", "00000000" + "00000001" + "00000005" + "00000064") +
        box("stsc", "00000000" + "00000001" + "00000001" + "00000005" + "00000001") +
        box("stsz", "00000000" + "00000014" + "00000005") +
        box("stco", "00000000" + "00000001" + "000000C8"))
    val trak = box("trak", box("edts", elst) +
      box("mdia", mdhd + box("minf", stbl)))
    hex(box("ftyp", "69736F6D" + "00000200") + box("moov", mvhd + trak))
  }

  private def editedPts(entries: Seq[(Long, Long, Int, Int)]): Option[Vector[Long]] =
    MediaHeaders.mp4Samples(elstFile(entries), applyEdits = true).map(_.map(_.ptsMs))

  test("mp4Samples applyEdits: two-segment splice REORDERS media; tail maps permissively") {
    // seg1 plays media [200,400) over pres [0,200)ms; seg2 plays
    // media [0,200) over pres [200,400)ms — back half first
    val segs = Seq((120L, 200L, 1, 0), (120L, 0L, 1, 0))
    // pts 400 is past every segment: permissive tail through the
    // nearest preceding segment (mt=200) → 0 + (400-200) = 200
    assert(editedPts(segs).contains(Vector(200L, 300L, 0L, 100L, 200L)))
    // the builder round-trips the single-edit form too (elstV0 twin:
    // 300-unit empty edit then mt=250 → pts+250)
    assert(editedPts(Seq((300L, -1L, 1, 0), (700L, 250L, 1, 0)))
      .contains(Vector(250L, 350L, 450L, 550L, 650L)))
  }

  test("mp4Samples applyEdits: media_rate stretches presentation time (2.0 and 0.5)") {
    // rate 2.0: 150 movie units present media [0,500) at half spacing
    assert(editedPts(Seq((150L, 0L, 2, 0)))
      .contains(Vector(0L, 50L, 100L, 150L, 200L)))
    // rate 0.5: media [0,125) in-segment; 200..400 fall out and map
    // permissively through the same segment — spacing doubles all the way
    assert(editedPts(Seq((150L, 0L, 0, 0x8000)))
      .contains(Vector(0L, 200L, 400L, 600L, 800L)))
  }

  test("mp4Samples applyEdits: dwell (rate 0) freezes its sample; list order beats overlap") {
    // seg1 dwells on pts==100 for 100ms; seg2 plays media [0,500)
    // from pres 100ms. pts 100 is in BOTH — the first segment in
    // list order wins, so it reports the dwell's showing
    val segs = Seq((60L, 100L, 0, 0), (300L, 0L, 1, 0))
    assert(editedPts(segs).contains(Vector(100L, 0L, 300L, 400L, 500L)))
  }

  test("mp4Samples applyEdits: empty edits between segments; all-empty list is pure delay") {
    // empty 100ms then one segment: every sample shifts +100
    assert(editedPts(Seq((60L, -1L, 1, 0), (120L, 0L, 1, 0)))
      .contains(Vector(100L, 200L, 300L, 400L, 500L)))
    // a list of ONLY empty edits presents no media: raw pts + total delay
    assert(editedPts(Seq((300L, -1L, 1, 0)))
      .contains(Vector(500L, 600L, 700L, 800L, 900L)))
  }

  test("mp4Samples applyEdits rejects: negative rate, zero-duration dwell, >64 entries") {
    assert(editedPts(Seq((120L, 0L, -1, 0))).isEmpty)
    assert(editedPts(Seq((0L, 100L, 0, 0))).isEmpty)
    val many = Seq.fill(65)((10L, 0L, 1, 0))
    assert(editedPts(many).isEmpty)
    assert(editedPts(Seq.fill(64)((10L, 0L, 1, 0))).isDefined)
  }
}
