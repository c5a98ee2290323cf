package graft.operators

/** REAL media metadata decode, pure JVM — no imaging library: header
  * parsers for the dominant container formats. This closes the "codec
  * is a stub" seam for METADATA (dimensions, duration): what a
  * curation pipeline actually filters on (resolution floors, duration
  * caps) comes from these headers; pixel/sample decode — the part that
  * genuinely needs a native codec — remains behind the
  * [[Multimodal.MediaCodec]] batch contract.
  *
  * Formats (byte-level, per spec):
  *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`; IHDR is always
  *    the first chunk, so width/height are big-endian u32 at offsets
  *    16/20.
  *  - GIF (87a/89a): logical-screen width/height little-endian u16 at
  *    offsets 6/8.
  *  - JPEG: `FF D8` then marker segments; width/height are in the
  *    frame header (SOF0..15 except DHT/JPG/DAC): height BE u16 at
  *    segment+5, width at +7. Segments are length-prefixed, so the
  *    walk is linear and bounded.
  *  - WAV: `RIFF....WAVE` then chunks; `fmt ` carries byteRate (LE u32
  *    at chunk+8), `data` carries the payload size → duration_ms =
  *    dataLen·1000 / byteRate.
  *  - MP4/MOV (ISO BMFF): linear box walk to `moov`→`mvhd`;
  *    duration_ms = duration·1000 / timescale (both mvhd versions,
  *    64-bit `largesize` boxes handled).
  *
  * Every parser returns None on malformed/foreign bytes — callers
  * decide the fallback, nothing throws on a corrupt corpus (at 100 TB
  * there WILL be truncated files; a poison-pill row must not kill the
  * stage).
  */
object MediaHeaders {

  /** (width, height) for PNG / GIF / JPEG / WebP / BMP / TIFF bytes;
    * None otherwise. */
  def imageDims(b: Array[Byte]): Option[(Long, Long)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le24(i: Int): Long = u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16)
    def le32(i: Int): Long = le24(i) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String): Boolean =
      i + s.length <= b.length && s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (b.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a)
      Some((be32(16), be32(20)))
    else if (b.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8' &&
        (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      Some((le16(6).toLong, le16(8).toLong))
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8)
      jpegDims(b)
    else if (b.length >= 16 && tag(0, "RIFF") && tag(8, "WEBP")) {
      // three container flavors, dims at spec'd fixed offsets
      if (tag(12, "VP8X") && b.length >= 30)
        Some((le24(24) + 1, le24(27) + 1)) // canvas size, stored −1
      else if (tag(12, "VP8 ") && b.length >= 30 &&
          u8(23) == 0x9d && u8(24) == 0x01 && u8(25) == 0x2a)
        Some(((le16(26) & 0x3fff).toLong, (le16(28) & 0x3fff).toLong)) // lossy keyframe
      else if (tag(12, "VP8L") && b.length >= 25 && u8(20) == 0x2f) {
        val bits = le32(21)
        Some(((bits & 0x3fff) + 1, ((bits >> 14) & 0x3fff) + 1)) // lossless, stored −1
      } else None
    } else if (b.length >= 22 && u8(0) == 'B' && u8(1) == 'M') {
      // Dispatch on the DIB header size at offset 14: the 12-byte
      // BITMAPCOREHEADER stores u16 width/height at 18/20; the INFO
      // family (40/52/56/108/124) stores s32 at 18/22 (height may be
      // negative = top-down rows). Unknown sizes → None, keeping the
      // "None on malformed/foreign bytes" contract.
      val dib = le32(14)
      if (dib == 12L) Some((le16(18).toLong, le16(20).toLong))
      else if (b.length >= 26 &&
          (dib == 40L || dib == 52L || dib == 56L || dib == 108L || dib == 124L))
        Some((le32(18), math.abs(le32(22).toInt).toLong))
      else None
    } else if (b.length >= 8 &&
        ((u8(0) == 'I' && u8(1) == 'I' && u8(2) == 42 && u8(3) == 0) ||
         (u8(0) == 'M' && u8(1) == 'M' && u8(2) == 0 && u8(3) == 42)))
      tiffDims(b)
    else None
  }

  /** Walk the first TIFF IFD for ImageWidth (256) / ImageLength (257);
    * either byte order, SHORT or LONG values.
    */
  private def tiffDims(b: Array[Byte]): Option[(Long, Long)] = {
    def u8(i: Int): Int = b(i) & 0xff
    val le = u8(0) == 'I'
    def u16(i: Int): Int =
      if (i < 0 || i + 2 > b.length) -1
      else if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (i < 0 || i + 4 > b.length) -1L
      else if (le) u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) | (u8(i + 2).toLong << 8) | u8(i + 3)
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = u16(ifd.toInt)
    if (n <= 0 || ifd + 2 + 12L * n > b.length) return None
    var w = -1L; var h = -1L
    var e = ifd.toInt + 2
    var i = 0
    while (i < n && (w < 0 || h < 0)) {
      val tag = u16(e)
      if (tag == 256 || tag == 257) {
        // count must be 1 (dims always are) — a count > 1 entry stores
        // an OFFSET in the value field, which must not read as a
        // dimension (malformed bytes degrade to None, never garbage)
        val v =
          if (u32(e + 4) != 1L) -1L
          else u16(e + 2) match {
            case 3 => u16(e + 8).toLong
            case 4 => u32(e + 8)
            case _ => -1L
          }
        if (tag == 256) w = v else h = v
      }
      e += 12
      i += 1
    }
    if (w > 0 && h > 0) Some((w, h)) else None
  }

  /** Walk JPEG marker segments to the first frame header (SOFn). */
  private def jpegDims(b: Array[Byte]): Option[(Long, Long)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    var i = 2
    while (i + 3 < b.length) {
      if (u8(i) != 0xff) return None // lost sync
      val marker = u8(i + 1)
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
        i += 2 // standalone marker, no length
      } else {
        if (i + 3 >= b.length) return None
        val len = be16(i + 2)
        if (len < 2) return None
        val isSof = (marker >= 0xc0 && marker <= 0xcf) &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc // not DHT/JPG/DAC
        if (isSof) {
          if (i + 8 < b.length && len >= 7)
            return Some((be16(i + 7).toLong, be16(i + 5).toLong))
          return None
        }
        i += 2 + len
      }
    }
    None
  }

  /** duration_ms for WAV, FLAC, MP3 or MP4/M4A bytes; None otherwise. */
  def audioDurationMs(b: Array[Byte]): Option[Long] =
    wavDurationMs(b).orElse(flacDurationMs(b)).orElse(mp3DurationMs(b))
      .orElse(mp4DurationMs(b))

  /** duration_ms for video containers (ISO BMFF — MP4/MOV/M4V); None
    * otherwise. */
  def videoDurationMs(b: Array[Byte]): Option[Long] = mp4DurationMs(b)

  /** Top-level box types that can legally open an ISO BMFF file —
    * anything else is foreign bytes, not a truncated MP4. */
  private val Mp4TopBoxes =
    Set("ftyp", "moov", "mdat", "free", "skip", "wide", "pdin", "pnot", "uuid")

  /** MP4/MOV duration from the `moov`→`mvhd` movie header (ISO 14496-12
    * §8.2.2): duration_ms = duration·1000 / timescale. The box walk is
    * linear and bounded — sizes that fail to advance abort with None,
    * so a corrupt length field cannot loop. Handles u32 sizes, the
    * size==1 64-bit `largesize` form, and size==0 (box extends to EOF);
    * both mvhd versions (v0: u32 fields, v1: u64 ctime/mtime+duration).
    */
  def mp4DurationMs(b: Array[Byte]): Option[Long] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Int): String =
      new String(Array(u8(i), u8(i + 1), u8(i + 2), u8(i + 3)).map(_.toByte), "ISO-8859-1")
    // find a child box's payload range within [start, end)
    def find(start: Long, end: Long, target: String): Option[(Long, Long)] = {
      var i = start
      while (i + 8 <= end) {
        val size0 = be32(i.toInt)
        val typ = fourcc(i.toInt + 4)
        val (payload, boxEnd) =
          if (size0 == 1L) {
            if (i + 16 > end) return None
            (i + 16, i + be64(i.toInt + 8))
          } else if (size0 == 0L) (i + 8, end) // last box, to EOF
          else (i + 8, i + size0)
        if (boxEnd <= i || boxEnd > end) return None // corrupt length
        if (typ == target) return Some((payload, boxEnd))
        i = boxEnd
      }
      None
    }
    if (b.length < 16 || !Mp4TopBoxes.contains(fourcc(4))) None // foreign bytes
    else
      find(0L, b.length.toLong, "moov").flatMap { case (moovStart, moovEnd) =>
        find(moovStart, moovEnd, "mvhd").flatMap { case (mvhd, mvhdEnd) =>
          // v0: ctime/mtime u32 → timescale at payload+12, duration u32 at +16
          // v1: ctime/mtime u64 → timescale at payload+20, duration u64 at +24
          // all-ones duration is the spec's "unknown" sentinel (ISO
          // 14496-12 §8.2.2); duration ZERO is the fragmented-file
          // convention (DASH/fMP4 set mvhd.duration = 0 and carry the
          // real total in moov/mvex/mehd or sidx) — both map to None,
          // not a fabricated 0 ms that a duration-floor filter would
          // silently drop every fragmented file on
          if (mvhd >= mvhdEnd) None
          else u8(mvhd.toInt) match {
            case 0 if mvhd + 20 <= mvhdEnd =>
              val ts = be32(mvhd.toInt + 12)
              val dur = be32(mvhd.toInt + 16)
              if (ts > 0 && dur != 0xFFFFFFFFL && dur != 0L) Some(dur * 1000L / ts) else None
            case 1 if mvhd + 32 <= mvhdEnd =>
              val ts = be32(mvhd.toInt + 20)
              val dur = be64(mvhd.toInt + 24)
              if (ts > 0 && dur != -1L && dur != 0L) Some(dur * 1000L / ts) else None
            case _ => None
          }
        }
      }
  }

  /** MPEG1 Layer III bitrate table, kbps by header index (0 = free
    * format, 15 = invalid — both rejected). */
  private val Mp3KbpsV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)

  /** MPEG1 sample rates by header index (3 = reserved → rejected). */
  private val Mp3RateV1 = Array(44100, 48000, 32000, 0)

  /** MP3 duration. Skips a leading ID3v2 tag (syncsafe 28-bit size),
    * then reads the first MPEG1 Layer III frame header. Two paths:
    *
    *  - VBR (`Xing`/`Info` marker right after the side info — 32 bytes
    *    for stereo/joint/dual, 17 for mono): the first frame's bitrate
    *    index is the header frame's, not the stream's, so duration
    *    comes from the Xing FRAME COUNT instead:
    *    frames·1152·1000 / samplerate. A Xing header without the
    *    frame-count flag returns None (no honest number exists).
    *  - CBR: audio bytes ÷ bitrate, duration_ms = audioBytes·8 DIV
    *    kbps, with a trailing 128-byte ID3v1 `TAG` block excluded from
    *    the byte count.
    *
    * Other MPEG versions return None — documented: MPEG1-L3 is the
    * dominant corpus case, and a None falls back to the stub rather
    * than a wrong number.
    */
  def mp3DurationMs(b: Array[Byte]): Option[Long] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def tag(i: Int, s: String): Boolean =
      i >= 0 && i + s.length <= b.length && s.indices.forall(j => u8(i + j) == s.charAt(j))
    var off = 0
    if (b.length >= 10 && u8(0) == 'I' && u8(1) == 'D' && u8(2) == '3') {
      val size = ((u8(6) & 0x7f) << 21) | ((u8(7) & 0x7f) << 14) |
        ((u8(8) & 0x7f) << 7) | (u8(9) & 0x7f)
      off = 10 + size
    }
    if (off + 4 > b.length || u8(off) != 0xff || (u8(off + 1) & 0xe0) != 0xe0) return None
    val version = (u8(off + 1) >> 3) & 3
    val layer = (u8(off + 1) >> 1) & 3
    if (version != 3 || layer != 1) return None // MPEG1 Layer III only
    val kbps = Mp3KbpsV1L3((u8(off + 2) >> 4) & 0xf)
    if (kbps == 0) return None // free-format or invalid index
    val rate = Mp3RateV1((u8(off + 2) >> 2) & 3)
    val sideInfo = if (((u8(off + 3) >> 6) & 3) == 3) 17 else 32
    // protection bit 0 = a 2-byte CRC sits between header and side info
    // (ISO 11172-3) — without this offset a CRC-protected Xing frame
    // would be missed and the lying header bitrate used as CBR
    val crc = if ((u8(off + 1) & 1) == 0) 2 else 0
    val xingAt = off + 4 + crc + sideInfo
    if (tag(xingAt, "Xing") || tag(xingAt, "Info")) {
      // VBR header frame: flags u32, then (flags&1) → u32 total frames;
      // each MPEG1-L3 frame carries 1152 samples
      if (xingAt + 12 > b.length || rate == 0) return None
      val flags = be32(xingAt + 4)
      if ((flags & 1L) == 0L) return None // no frame count recorded
      return Some(be32(xingAt + 8) * 1152L * 1000L / rate)
    }
    // trailing ID3v1 tag is metadata, not audio
    val end = if (tag(b.length - 128, "TAG")) b.length - 128 else b.length
    if (end <= off) return None
    Some((end - off).toLong * 8L / kbps)
  }

  /** duration_ms from a FLAC STREAMINFO block (always the first
    * metadata block after the `fLaC` marker): sample rate is a 20-bit
    * big-endian field at STREAMINFO offset 10, total samples the
    * 36-bit field ending at offset 17 → duration = samples·1000/rate.
    */
  def flacDurationMs(b: Array[Byte]): Option[Long] = {
    def u8(i: Int): Int = b(i) & 0xff
    if (b.length < 26 || u8(0) != 'f' || u8(1) != 'L' || u8(2) != 'a' || u8(3) != 'C')
      return None
    if ((u8(4) & 0x7f) != 0) return None // first block must be STREAMINFO
    // STREAMINFO data starts at byte 8; rate bits at data+10..12
    val rate = (u8(18).toLong << 12) | (u8(19) << 4) | (u8(20) >> 4)
    val total = ((u8(21) & 0x0f).toLong << 32) | (u8(22).toLong << 24) |
      (u8(23).toLong << 16) | (u8(24).toLong << 8) | u8(25).toLong
    // total-samples 0 is the spec's "unknown" (live/streamed capture) —
    // None, not a fabricated 0 ms
    if (rate > 0 && total > 0) Some(total * 1000L / rate) else None
  }

  /** duration_ms for RIFF/WAVE bytes; None otherwise. */
  def wavDurationMs(b: Array[Byte]): Option[Long] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String): Boolean =
      i + s.length <= b.length && s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var byteRate = 0L
    var dataLen = -1L
    while (i + 8 <= b.length && (byteRate == 0L || dataLen < 0L)) {
      val size = le32(i + 4)
      if (tag(i, "fmt ") && i + 20 <= b.length) byteRate = le32(i + 16)
      else if (tag(i, "data")) dataLen = size
      if (size < 0 || size > b.length.toLong) return None
      i += 8 + size.toInt + (size.toInt & 1) // chunks are 2-byte aligned
    }
    if (byteRate > 0 && dataLen >= 0) Some(dataLen * 1000L / byteRate) else None
  }

  /** One MP4 sample's placement: index, absolute byte offset, byte
    * size, decode + presentation timestamps in ms, and whether the
    * sample is a sync (key) frame — the only kind a downstream
    * decoder can use standalone. */
  final case class Mp4Sample(idx: Int, offset: Long, size: Long, dtsMs: Long,
                             ptsMs: Long, isSync: Boolean)

  /** Sample table of the FIRST trak in an ISO-BMFF (MP4/MOV) file —
    * the byte-range map frame sampling needs at corpus scale: pick
    * samples by timestamp, slice their ranges, decode elsewhere.
    * Rebuilt from the normative tables (ISO 14496-12 §8.5-8.7):
    * `stts` (run-length decode deltas), `stsz` (per-sample or
    * constant sizes), `stsc` (sample-to-chunk runs, 1-based
    * first_chunk), and `stco`/`co64` (chunk offsets); timestamps
    * scale by the mdhd media timescale (v0 and v1). Presentation
    * order and decodability come from two OPTIONAL tables: `ctts`
    * (§8.6.1.3) carries per-sample composition offsets — v0 unsigned,
    * v1 signed (B-frame reorder shifts pts both ways) — so
    * `pts = dts + offset` (absent table: pts = dts); `stss` (§8.6.2)
    * lists the sync samples by 1-based strictly-increasing sample
    * number, and an ABSENT table means every sample is sync — the
    * normative default, so a P-frame-free stream needs no table.
    * By default pts is RAW media time (no `elst`): raw pts is what
    * byte-range selection needs, and a v1 ctts can make early pts
    * legitimately negative. `applyEdits = true` additionally honors
    * the trak's FULL edit list (§8.6.6) the way players do: each
    * entry is a presentation segment — EMPTY edits (`media_time =
    * -1`) advance the presentation clock by their `segment_duration`
    * (MOVIE-timescale units, so the mvhd timescale governs them);
    * a non-empty entry plays the media interval starting at its
    * `media_time` (media units) over its presentation window,
    * stretched by `media_rate` (16.16 fixed point: 1.0 plays
    * through, 2.0 double-speed halves presentation spacing, 0 is a
    * DWELL that freezes the sample at `media_time` for the whole
    * segment). Multi-entry splice lists map each sample through the
    * FIRST segment whose media interval contains its pts (splices
    * may reorder or replay media; a replayed sample reports its
    * first showing). A sample NO segment presents maps permissively
    * through the nearest preceding non-empty segment — tail
    * overruns and splice gaps keep monotone timestamps for
    * byte-range selection rather than vanishing — or, before every
    * segment, through the first one (head trim: early pts go
    * negative, floor semantics). An absent edts/elst means no
    * adjustment; a PRESENT-but-malformed elst (bad version,
    * zero/negative entry count, >64 entries, truncated entries,
    * negative media_rate, zero-duration dwell, missing mvhd, or
    * values past the 2^50-unit sanity bound) rejects the file like
    * any other inconsistent table. dts and sync flags stay raw
    * media values either way.
    *
    * Offsets are NOT validated against the buffer — real files
    * carry the data in `mdat`, and a metadata-only prefix is a
    * legitimate input; the caller slices. Inconsistent tables (fewer
    * chunks, time runs, or composition runs than samples, zero
    * timescale, non-increasing or out-of-range sync entries, bad
    * ctts version, truncation) return None; sample count is capped
    * before any allocation.
    */
  def mp4Samples(b: Array[Byte], maxSamples: Int = 1 << 20,
                 applyEdits: Boolean = false): Option[Vector[Mp4Sample]] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be32(i: Long): Long =
      if (i < 0 || i + 4 > b.length) -1L
      else (u8(i.toInt).toLong << 24) | (u8(i.toInt + 1) << 16) | (u8(i.toInt + 2) << 8) | u8(i.toInt + 3)
    def be64(i: Long): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Long): String =
      if (i < 0 || i + 4 > b.length) ""
      else new String(Array(u8(i.toInt), u8(i.toInt + 1), u8(i.toInt + 2), u8(i.toInt + 3)).map(_.toByte), "ISO-8859-1")
    def find(start: Long, end: Long, target: String): Option[(Long, Long)] = {
      var i = start
      while (i + 8 <= end) {
        val size0 = be32(i)
        val typ = fourcc(i + 4)
        val (payload, boxEnd) =
          if (size0 == 1L) {
            if (i + 16 > end) return None
            (i + 16, i + be64(i + 8))
          } else if (size0 == 0L) (i + 8, end)
          else (i + 8, i + size0)
        if (boxEnd <= i || boxEnd > end) return None
        if (typ == target) return Some((payload, boxEnd))
        i = boxEnd
      }
      None
    }
    if (b.length < 16 || !Mp4TopBoxes.contains(fourcc(4))) return None
    val stblOpt = for {
      (moov, moovEnd) <- find(0L, b.length.toLong, "moov")
      (trak, trakEnd) <- find(moov, moovEnd, "trak")
      (mdia, mdiaEnd) <- find(trak, trakEnd, "mdia")
      (mdhd, mdhdEnd) <- find(mdia, mdiaEnd, "mdhd")
      (minf, minfEnd) <- find(mdia, mdiaEnd, "minf")
      (stbl, stblEnd) <- find(minf, minfEnd, "stbl")
    } yield (moov, moovEnd, trak, trakEnd, mdhd, mdhdEnd, stbl, stblEnd)
    val (moov, moovEnd, trak, trakEnd, mdhd, mdhdEnd, stbl, stblEnd) =
      stblOpt.getOrElse(return None)
    if (mdhd >= mdhdEnd) return None
    val timescale = u8(mdhd.toInt) match {
      case 0 if mdhd + 16 <= mdhdEnd => be32(mdhd + 12)
      case 1 if mdhd + 24 <= mdhdEnd => be32(mdhd + 20)
      case _                         => return None
    }
    if (timescale <= 0) return None
    // edit list (only under applyEdits): the FULL splice list per
    // §8.6.6 — each entry is a presentation segment (presStartMs,
    // media_time [-1 = empty edit], media span in media units,
    // media_rate as 16.16 fixed). Segment durations are
    // MOVIE-timescale units (§8.6.6.3); media_time and the sample pts
    // they map are MEDIA-timescale units; rate stretches one into the
    // other (rate 0 = dwell: the sample AT media_time holds for the
    // whole segment).
    val (editSegs, editTotalPresMs): (Vector[(Long, Long, Long, Long)], Long) = {
      if (!applyEdits) (Vector.empty, 0L)
      else find(trak, trakEnd, "edts").flatMap { case (edts, edtsEnd) =>
        find(edts, edtsEnd, "elst")
      } match {
        case None => (Vector.empty, 0L) // no edit list: no adjustment
        case Some((elst, elstEnd)) =>
          if (elst + 8 > elstEnd) return None
          val ver = u8(elst.toInt)
          if (ver > 1) return None
          val n = be32(elst + 4)
          val entrySz = if (ver == 1) 20L else 12L
          if (n <= 0 || elst + 8 + entrySz * n > elstEnd) return None
          // a real edit list is single-digit entries; hundreds is a
          // crafted file, and the per-sample segment search below is
          // linear in the list length
          if (n > 64) return None
          val (mvhd, mvhdEnd) = find(moov, moovEnd, "mvhd").getOrElse(return None)
          if (mvhd >= mvhdEnd) return None
          val movieTs = u8(mvhd.toInt) match {
            case 0 if mvhd + 16 <= mvhdEnd => be32(mvhd + 12)
            case 1 if mvhd + 24 <= mvhdEnd => be32(mvhd + 20)
            case _                         => return None
          }
          if (movieTs <= 0) return None
          // 2^50 time units is ~35k years at ANY timescale — values
          // past it are crafted, and unguarded they overflow the
          // *1000 arithmetic into silent garbage pts instead of the
          // None every other inconsistent table returns
          val maxUnits = 1L << 50
          def be16s(i: Long): Int = {
            val v = (u8(i.toInt) << 8) | u8(i.toInt + 1)
            if (v >= 0x8000) v - 0x10000 else v
          }
          val segs = Vector.newBuilder[(Long, Long, Long, Long)]
          var presUnits = 0L
          var e = 0
          while (e < n) {
            val at = elst + 8 + entrySz * e
            val (dur, mt, rateAt) =
              if (ver == 1) (be64(at), be64(at + 8), at + 16)
              else {
                val raw = be32(at + 4)
                (be32(at), if (raw >= 0x80000000L) raw - 0x100000000L else raw, at + 8)
              }
            if (dur < 0 || dur > maxUnits) return None
            if (mt > maxUnits) return None
            val rateInt = be16s(rateAt)
            val rateFrac = (u8(rateAt.toInt + 2) << 8) | u8(rateAt.toInt + 3)
            if (rateInt < 0) return None // reverse-rate edits are not a thing
            val rateFixed = rateInt.toLong * 65536L + rateFrac
            // media span covered by this segment, in media units:
            // dur[movie] × (mediaTs/movieTs) × rate — exact via BigInt,
            // floor, then bounds-checked like every other table value
            val span =
              if (mt < 0 || rateFixed == 0L) 0L
              else {
                val s = (BigInt(dur) * timescale * rateFixed) / (BigInt(movieTs) * 65536L)
                if (s > maxUnits) return None
                s.toLong
              }
            if (mt >= 0 && rateFixed == 0L && dur == 0L) return None // dwell needs a duration
            val presStartMs = presUnits * 1000L / movieTs
            segs += ((presStartMs, if (mt < 0) -1L else mt, span, rateFixed))
            presUnits += dur
            if (presUnits > maxUnits) return None
            e += 1
          }
          (segs.result(), presUnits * 1000L / movieTs)
      }
    }
    // pts[media units] → presentation ms through the splice list:
    // the first segment whose media interval contains pts wins; a
    // sample no segment presents maps PERMISSIVELY through the
    // nearest preceding non-empty segment (tail overruns and splice
    // gaps keep monotone timestamps for byte-range selection) or,
    // before every segment, through the first one (head trim — early
    // pts go negative, floor semantics). A list with no non-empty
    // entry presents no media: raw pts shifted by the whole list's
    // delay, the degenerate form of the leading-empty-edit rule.
    // Returns Long.MinValue when a crafted rate/timescale combination
    // would overflow ms arithmetic — the caller rejects the file.
    def mapPtsMs(pts: Long): Long = {
      if (editSegs.isEmpty) return Math.floorDiv(pts * 1000L, timescale)
      var chosen = -1
      var i = 0
      while (i < editSegs.length && chosen < 0) {
        val (_, mt, span, rateFixed) = editSegs(i)
        if (mt >= 0 &&
          ((rateFixed == 0L && pts == mt) ||
            (rateFixed > 0L && pts >= mt && pts < mt + span))) chosen = i
        i += 1
      }
      if (chosen < 0) {
        var best = -1
        var bestMt = Long.MinValue
        var first = -1
        var j = 0
        while (j < editSegs.length) {
          val (_, mt, _, _) = editSegs(j)
          if (mt >= 0) {
            if (first < 0) first = j
            if (mt <= pts && mt > bestMt) { best = j; bestMt = mt }
          }
          j += 1
        }
        chosen = if (best >= 0) best else first
        if (chosen < 0) // all-empty list: pure delay
          return Math.floorDiv(pts * 1000L, timescale) + editTotalPresMs
      }
      val (presMs, mt, _, rateFixed) = editSegs(chosen)
      if (rateFixed == 0L) presMs // dwell: frozen at the segment start
      else if (rateFixed == 65536L) // rate 1.0: exact Long fast path
        presMs + Math.floorDiv((pts - mt) * 1000L, timescale)
      else {
        // rational rate: presentation elapsed = media elapsed / rate
        val num = BigInt(pts - mt) * 65536L * 1000L
        val den = BigInt(rateFixed) * timescale
        val q = num / den
        val r = num % den
        val f = if (r.signum != 0 && num.signum < 0) q - 1 else q // floor
        if (f.abs > BigInt(1L << 53)) Long.MinValue else presMs + f.toLong
      }
    }
    // stsz: constant size or per-sample table
    val (stsz, stszEnd) = find(stbl, stblEnd, "stsz").getOrElse(return None)
    if (stsz + 12 > stszEnd) return None
    val constSize = be32(stsz + 4)
    val nSamples = be32(stsz + 8)
    if (nSamples < 0 || nSamples > maxSamples) return None
    if (constSize == 0 && stsz + 12 + 4L * nSamples > stszEnd) return None
    def sizeOf(k: Int): Long = if (constSize != 0) constSize else be32(stsz + 12 + 4L * k)
    // stts runs
    val (stts, sttsEnd) = find(stbl, stblEnd, "stts").getOrElse(return None)
    val nTimeRuns = be32(stts + 4)
    if (nTimeRuns < 0 || stts + 8 + 8L * nTimeRuns > sttsEnd) return None
    // ctts (optional): composition-offset runs; v0 unsigned, v1 signed
    val (cttsAt, nCompRuns, cttsSigned) = find(stbl, stblEnd, "ctts") match {
      case Some((ctts, cttsEnd)) =>
        if (ctts + 8 > cttsEnd) return None
        val ver = u8(ctts.toInt)
        if (ver > 1) return None
        val n = be32(ctts + 4)
        if (n <= 0 || ctts + 8 + 8L * n > cttsEnd) return None
        (ctts, n.toInt, ver == 1)
      case None => (-1L, 0, false)
    }
    // stss (optional): 1-based sync-sample numbers, strictly
    // increasing and within [1, nSamples]; nSync = -1 marks ABSENT
    // (every sample sync) as distinct from an empty table
    val (stssAt, nSync) = find(stbl, stblEnd, "stss") match {
      case Some((stss, stssEnd)) =>
        val n = be32(stss + 4)
        if (n < 0 || stss + 8 + 4L * n > stssEnd) return None
        (stss, n.toInt)
      case None => (-1L, -1)
    }
    if (nSync > 0) {
      var p = 0
      var prev = 0L
      while (p < nSync) {
        val e = be32(stssAt + 8 + 4L * p)
        if (e <= prev || e > nSamples) return None
        prev = e
        p += 1
      }
    }
    // stsc runs: the first run MUST start at chunk 1 and first_chunk
    // values must strictly increase, or the walk would silently apply
    // a wrong run to early chunks — inconsistent tables reject
    val (stsc, stscEnd) = find(stbl, stblEnd, "stsc").getOrElse(return None)
    val nScRuns = be32(stsc + 4)
    if (nScRuns <= 0 || stsc + 8 + 12L * nScRuns > stscEnd) return None
    if (be32(stsc + 8) != 1L) return None
    var scChk = 1
    while (scChk < nScRuns) {
      if (be32(stsc + 8 + 12L * scChk) <= be32(stsc + 8 + 12L * (scChk - 1))) return None
      scChk += 1
    }
    // chunk offsets: stco (u32) or co64 (u64)
    val (chunkAt, nChunks): (Int => Long, Long) =
      find(stbl, stblEnd, "stco") match {
        case Some((stco, stcoEnd)) =>
          val n = be32(stco + 4)
          if (n < 0 || stco + 8 + 4L * n > stcoEnd) return None
          ((c: Int) => be32(stco + 8 + 4L * c), n)
        case None =>
          val (co64, co64End) = find(stbl, stblEnd, "co64").getOrElse(return None)
          val n = be32(co64 + 4)
          if (n < 0 || co64 + 8 + 8L * n > co64End) return None
          ((c: Int) => be64(co64 + 8 + 8L * c), n)
      }
    val out = Vector.newBuilder[Mp4Sample]
    var sample = 0
    var dts = 0L
    var tRun = 0
    var tLeft = if (nTimeRuns > 0) be32(stts + 8) else 0L
    var tDelta = if (nTimeRuns > 0) be32(stts + 12) else 0L
    def compOff(raw: Long): Long =
      if (cttsSigned && raw >= 0x80000000L) raw - 0x100000000L else raw
    var cRun = 0
    var cLeft = if (nCompRuns > 0) be32(cttsAt + 8) else 0L
    var cOff = if (nCompRuns > 0) compOff(be32(cttsAt + 12)) else 0L
    var syncPtr = 0
    var scRun = 0
    var chunk = 1L
    while (sample < nSamples && chunk <= nChunks) {
      // advance to the stsc run governing this chunk (runs carry
      // 1-based first_chunk; the NEXT run's first_chunk ends this one)
      while (scRun + 1 < nScRuns && be32(stsc + 8 + 12L * (scRun + 1)) <= chunk) scRun += 1
      val spc = be32(stsc + 8 + 12L * scRun + 4)
      if (spc <= 0) return None
      var off = chunkAt((chunk - 1).toInt)
      if (off < 0) return None
      var k = 0L
      while (k < spc && sample < nSamples) {
        if (tLeft <= 0) {
          tRun += 1
          if (tRun >= nTimeRuns) return None // time runs exhausted early
          tLeft = be32(stts + 8 + 8L * tRun)
          tDelta = be32(stts + 12 + 8L * tRun)
        }
        if (nCompRuns > 0 && cLeft <= 0) {
          cRun += 1
          if (cRun >= nCompRuns) return None // composition runs exhausted early
          cLeft = be32(cttsAt + 8 + 8L * cRun)
          cOff = compOff(be32(cttsAt + 12 + 8L * cRun))
        }
        val sz = sizeOf(sample)
        if (sz < 0) return None
        val pts = dts + (if (nCompRuns > 0) cOff else 0L)
        val isSync =
          if (nSync < 0) true // absent table: every sample is sync
          else {
            while (syncPtr < nSync && be32(stssAt + 8 + 4L * syncPtr) < sample + 1) syncPtr += 1
            syncPtr < nSync && be32(stssAt + 8 + 4L * syncPtr) == sample + 1
          }
        // floorDiv, not /: a v1 ctts (or an edit-list head trim)
        // legitimately makes early pts negative, and truncation-
        // toward-zero would round the wrong way there (dts is never
        // negative, so / is fine for it)
        val ptsMs = mapPtsMs(pts)
        if (ptsMs == Long.MinValue) return None // crafted rate overflow
        out += Mp4Sample(sample, off, sz, dts * 1000L / timescale, ptsMs, isSync)
        off += sz
        dts += tDelta
        tLeft -= 1
        if (nCompRuns > 0) cLeft -= 1
        sample += 1
        k += 1
      }
      chunk += 1
    }
    if (sample < nSamples) return None // chunk table shorter than the sample count
    Some(out.result())
  }
}
