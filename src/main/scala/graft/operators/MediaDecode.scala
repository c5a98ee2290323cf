package graft.operators

/** REAL pixel/sample decode, pure JVM — the part of the multimodal
  * seam that does NOT need a native codec, decoded for real:
  *
  *  - BMP: uncompressed BITMAPINFOHEADER — 24 bpp BGR, 32 bpp BGRX,
  *    and 8 bpp through the color table; rows 4-byte padded,
  *    bottom-up (positive height) or top-down.
  *  - PNG: 8-bit greyscale / grey+alpha / palette / RGB / RGBA (color
  *    types 0/3/4/2/6; palette resolves through PLTE to RGB) — the
  *    lossless web shapes — IDAT chunks concatenated, zlib-inflated
  *    with `java.util.zip.Inflater` (in every JVM), then per-row
  *    filter reversal (None/Sub/Up/Average/Paeth, RFC 2083 §6).
  *  - GIF: 87a/89a first frame — full LZW (variable 3..12-bit codes,
  *    clear/EOI, dictionary self-reference) + 4-pass interlace,
  *    palette-resolved to RGB.
  *  - TIFF: baseline 6.0 — 8-bit grey/RGB strips (none/LZW/Deflate/
  *    PackBits compression + horizontal predictor), chunky layout,
  *    both byte orders (`II`/`MM`).
  *  - WAV: PCM 8/16/24/32-bit (plain or EXTENSIBLE, any channel
  *    count, reduced to the 16-bit view), IMA ADPCM (wFormatTag
  *    0x0011) 4-bit block decode, and G.711 μ-law/A-law
  *    (0x0007/0x0006) companded-byte expansion.
  *
  * JPEG decodes for real too, baseline AND progressive
  * ([[JpegDecode]] — Huffman + IDCT + chroma upsample, pure JVM); only lossy AUDIO (MP3/AAC) and
  * lossy-compressed WebP stay behind the [[Multimodal.MediaCodec]]
  * stub (no pure-JVM decode or offline cross-validator exists for
  * either — VP8/VP8L carry empirically-chosen code tables that
  * cannot be re-derived from the bitstream spec alone). Everything
  * here returns None on malformed/foreign/unsupported bytes (16-bit
  * channels, RLE BMP, arithmetic-coded JPEG, tiled TIFF): at corpus
  * scale a truncated file must degrade, never throw.
  *
  * [[Multimodal.HeaderCodec]] uses these to emit REAL features
  * (channel means / luma for images, RMS/peak for audio) instead of
  * the byte-hash stub whenever the bytes decode.
  */
object MediaDecode {

  /** Interleaved 8-bit channel data, row-major from the top-left. */
  final case class PixelImage(width: Int, height: Int, channels: Int, data: Array[Byte]) {
    def meanChannel(c: Int): Double = {
      var s = 0L; var i = c
      val n = width * height
      while (i < data.length) { s += (data(i) & 0xff); i += channels }
      if (n == 0) 0.0 else s.toDouble / n
    }
    /** Rec.601 luma over the first three channels (grey = itself). */
    def meanLuma: Double =
      if (channels >= 3) 0.299 * meanChannel(0) + 0.587 * meanChannel(1) + 0.114 * meanChannel(2)
      else meanChannel(0)
  }

  // ---- BMP ---------------------------------------------------------

  /** Uncompressed BMP → RGB pixels: 24 bpp BGR, 32 bpp BGRX (the
    * fourth byte is undefined under BI_RGB and is dropped), and 8 bpp
    * through the BGRA-quad color table (biClrUsed colors, 0 = 256).
    */
  def bmpPixels(b: Array[Byte]): Option[PixelImage] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (b.length < 54 || u8(0) != 'B' || u8(1) != 'M') return None
    if (le32(14) != 40L) return None                  // BITMAPINFOHEADER only
    val w = le32(18).toInt
    val hRaw = le32(22).toInt
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
    if (le16(26) != 1) return None                    // 1 plane
    val bpp = le16(28)
    if (bpp != 8 && bpp != 24 && bpp != 32) return None
    if (le32(30) != 0L) return None                   // BI_RGB (uncompressed)
    val palN =
      if (bpp != 8) 0
      else { val c = le32(46); if (c == 0L) 256 else if (c > 256L) return None else c.toInt }
    val palOff = 54                                   // right after the INFO header
    if (bpp == 8 && palOff + 4 * palN > b.length) return None
    val off = le32(10).toInt
    val srcBytes = bpp / 8
    val rowBytes = (w * srcBytes + 3) & ~3            // rows pad to 4 bytes
    if (off < 0 || off.toLong + rowBytes.toLong * h > b.length) return None
    if (w.toLong * h * 3 > (1L << 30)) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = off + (if (topDown) y else h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val s = srcRow + x * srcBytes
        val d = (y * w + x) * 3
        if (bpp == 8) {
          val idx = u8(s)
          if (idx >= palN) return None
          val p = palOff + 4 * idx                    // table quads are B,G,R,reserved
          out(d) = b(p + 2); out(d + 1) = b(p + 1); out(d + 2) = b(p)
        } else {
          out(d) = b(s + 2); out(d + 1) = b(s + 1); out(d + 2) = b(s) // BGR → RGB
        }
        x += 1
      }
      y += 1
    }
    Some(PixelImage(w, h, 3, out))
  }

  // ---- PNG ---------------------------------------------------------

  /** 8-bit grey / grey+alpha / palette / RGB / RGBA PNG → pixels
    * (palette indices resolve through PLTE to RGB), progressive
    * (Adam7-interlaced) or not — interlaced scanlines unfilter within
    * each of the seven passes, then scatter to display positions.
    */
  def pngPixels(b: Array[Byte]): Option[PixelImage] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (b.length < 45) return None
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    if (!(0 until 8).forall(i => u8(i) == sig(i))) return None
    // IHDR is first: dims, bit depth, color type, interlace
    if (be32(8) != 13L || u8(12) != 'I' || u8(13) != 'H' || u8(14) != 'D' || u8(15) != 'R')
      return None
    val w = be32(16).toInt
    val h = be32(20).toInt
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
    if (u8(24) != 8) return None                       // 8-bit channels only
    val colorType = u8(25)
    val channels = colorType match {
      case 0 => 1   // greyscale
      case 2 => 3   // RGB
      case 3 => 1   // palette (1 index byte per pixel, resolved below)
      case 4 => 2   // grey + alpha
      case 6 => 4   // RGBA
      case _ => return None                            // 16-bit / reserved
    }
    val interlaced = u8(28) match {
      case 0 => false
      case 1 => true
      case _ => return None
    }
    // walk chunks, concatenate IDAT payloads (and PLTE for type 3)
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var sawEnd = false
    var pltOff = -1
    var pltLen = 0
    while (i + 8 <= b.length && !sawEnd) {
      val len = be32(i)
      if (len < 0 || i + 12 + len > b.length) return None
      val typ = new String(b.slice(i + 4, i + 8), "ISO-8859-1")
      if (typ == "IDAT") idat.write(b, i + 8, len.toInt)
      else if (typ == "PLTE") { pltOff = i + 8; pltLen = len.toInt / 3 }
      else if (typ == "IEND") sawEnd = true
      i += 12 + len.toInt // len + type + crc
    }
    if (idat.size() == 0) return None
    if (colorType == 3 && (pltOff < 0 || pltLen == 0)) return None
    // pass geometry: Adam7's seven (xStart, yStart, xStep, yStep)
    // sub-images, or one full pass when not interlaced; empty passes
    // (dimension collapses to 0) contribute NO scanlines at all
    val passes =
      (if (interlaced)
        Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
      else Seq((0, 0, 1, 1)))
        .map { case (xs, ys, xst, yst) =>
          (xs, ys, xst, yst,
            if (w > xs) (w - xs + xst - 1) / xst else 0,   // pass width
            if (h > ys) (h - ys + yst - 1) / yst else 0) } // pass height
        .filter { case (_, _, _, _, pw, ph) => pw > 0 && ph > 0 }
    // zlib inflate to the filtered scanlines: per pass, ph rows of
    // 1 filter byte + pw·channels data bytes. Sized in Long first: a
    // few compressed bytes can CLAIM huge dims (decompression bomb /
    // Int overflow), so cap the decoded footprint before allocating.
    val strideL = w.toLong * channels
    val rawLenL = passes.map { case (_, _, _, _, pw, ph) =>
      ph.toLong * (1L + pw.toLong * channels) }.sum
    // cap the OUTPUT footprint too: for palette images (type 3) the
    // decoded stride is 1 byte/pixel but the PLTE expansion below emits
    // 3, so a w*h just under the 2^30 raw cap could still compute a
    // negative h*w*3 Int and throw — violating the never-throw contract
    val outLenL = h.toLong * w * (if (colorType == 3) 3 else channels)
    if (rawLenL > (1L << 30) || h.toLong * strideL > (1L << 30) ||
      outLenL > (1L << 30)) return None
    val stride = strideL.toInt
    val raw = new Array[Byte](rawLenL.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // truncated stream or preset-dictionary demand: no progress
        // possible — bail rather than spin
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        got += n
      }
      if (got < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // reverse per-row filters (RFC 2083 §6.1): a = left, b = up,
    // c = up-left — neighbors live WITHIN the pass, then each pass
    // pixel scatters to its display position
    val out = new Array[Byte](h * stride)
    val bpp = channels
    var rawAt = 0
    for ((xs, ys, xst, yst, pw, ph) <- passes) {
      val pStride = pw * channels
      val prev = new Array[Byte](pStride)
      val cur = new Array[Byte](pStride)
      var y = 0
      while (y < ph) {
        val filter = raw(rawAt) & 0xff
        val src = rawAt + 1
        var x = 0
        while (x < pStride) {
          val rawV = raw(src + x) & 0xff
          val a = if (x >= bpp) cur(x - bpp) & 0xff else 0
          val up = if (y > 0) prev(x) & 0xff else 0
          val c = if (y > 0 && x >= bpp) prev(x - bpp) & 0xff else 0
          val v = filter match {
            case 0 => rawV
            case 1 => rawV + a
            case 2 => rawV + up
            case 3 => rawV + (a + up) / 2
            case 4 => // Paeth predictor
              val p = a + up - c
              val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
              val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
              rawV + pred
            case _ => return None                      // invalid filter id
          }
          cur(x) = (v & 0xff).toByte
          x += 1
        }
        // scatter the pass row into display coordinates
        var px = 0
        while (px < pw) {
          val dst = (ys + y * yst) * stride + (xs + px * xst) * channels
          var ch = 0
          while (ch < channels) { out(dst + ch) = cur(px * channels + ch); ch += 1 }
          px += 1
        }
        System.arraycopy(cur, 0, prev, 0, pStride)
        y += 1
        rawAt += 1 + pStride
      }
    }
    if (colorType != 3) Some(PixelImage(w, h, channels, out))
    else {
      // resolve palette indices through PLTE to RGB
      val rgb = new Array[Byte](h * w * 3)
      var p = 0
      while (p < out.length) {
        val idx = out(p) & 0xff
        if (idx >= pltLen) return None
        val src = pltOff + 3 * idx
        rgb(3 * p) = b(src); rgb(3 * p + 1) = b(src + 1); rgb(3 * p + 2) = b(src + 2)
        p += 1
      }
      Some(PixelImage(w, h, 3, rgb))
    }
  }

  // ---- GIF ---------------------------------------------------------

  /** GIF87a/89a first-frame pixels → RGB (palette resolved; animation
    * frames beyond the first and transparency are out of scope — the
    * first image descriptor IS the still image for the curation
    * features this feeds). Full LZW: variable code width 3..12 bits
    * LSB-first across reassembled sub-blocks, clear/EOI codes,
    * dictionary growth with the `code == next` self-reference case,
    * and the 4-pass Adam-style row interlace. The returned frame is
    * the image descriptor's own w×h (a frame may be smaller than the
    * logical screen). Malformed streams — bad codes, short data,
    * missing palette — return None, never throw.
    */
  def gifPixels(b: Array[Byte]): Option[PixelImage] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (b.length < 14) return None
    val sig = new String(b.slice(0, 6), "ISO-8859-1")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val packed = u8(10)
    val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 7) else 0
    var i = 13
    if (i + 3 * gctSize > b.length) return None
    val gctOff = i
    i += 3 * gctSize
    // walk extensions to the first image descriptor
    while (i < b.length && u8(i) == 0x21) {
      i += 2 // introducer + label
      var done = false
      while (!done) {
        if (i >= b.length) return None
        val len = u8(i); i += 1
        if (len == 0) done = true
        else { i += len; if (i > b.length) return None }
      }
    }
    if (i + 10 > b.length || u8(i) != 0x2c) return None
    val w = le16(i + 5)
    val h = le16(i + 7)
    val ip = u8(i + 9)
    val interlaced = (ip & 0x40) != 0
    val lctSize = if ((ip & 0x80) != 0) 2 << (ip & 7) else 0
    i += 10
    val palOff = if (lctSize > 0) i else gctOff
    val palSize = if (lctSize > 0) lctSize else gctSize
    i += 3 * lctSize
    if (palSize == 0 || i >= b.length || palOff + 3 * palSize > b.length) return None
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
      w.toLong * h > (1L << 26)) return None
    val minCode = u8(i); i += 1
    if (minCode < 2 || minCode > 8) return None
    // reassemble LZW sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      if (i >= b.length) return None
      val len = u8(i); i += 1
      if (len == 0) done = true
      else {
        if (i + len > b.length) return None
        data.write(b, i, len); i += len
      }
    }
    val stream = data.toByteArray
    // LZW decode to color indices
    val clear = 1 << minCode
    val eoi = clear + 1
    val nPixels = w * h
    val indices = new Array[Byte](nPixels)
    // dictionary as (prefix code, appended index) pairs — O(1) append,
    // entries materialize by walking the prefix chain
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    val entryLen = new Array[Int](4096)
    var dictSize = eoi + 1
    var codeSize = minCode + 1
    var prev = -1
    var bitPos = 0
    var out = 0
    val totalBits = stream.length * 8
    def emit(code: Int): Boolean = { // write entry for `code`, backwards
      val n = entryLen(code)
      if (out + n > nPixels) return false
      var c = code
      var at = out + n - 1
      while (c >= clear + 2) { indices(at) = append(c); at -= 1; c = prefix(c) }
      indices(at) = c.toByte
      out += n
      true
    }
    var j = 0
    while (j < clear) { prefix(j) = -1; append(j) = j.toByte; entryLen(j) = 1; j += 1 }
    var fail = false
    var ended = false
    while (!ended && !fail && out < nPixels) {
      if (bitPos + codeSize > totalBits) { fail = true }
      else {
        // LSB-first across byte boundaries
        var code = 0
        var k = 0
        while (k < codeSize) {
          val bp = bitPos + k
          code |= ((stream(bp >> 3) >> (bp & 7)) & 1) << k
          k += 1
        }
        bitPos += codeSize
        if (code == clear) {
          dictSize = eoi + 1; codeSize = minCode + 1; prev = -1
        } else if (code == eoi) {
          ended = true
        } else if (prev == -1) {
          if (code >= clear) fail = true
          else { if (!emit(code)) fail = true; prev = code }
        } else if (code < dictSize && code != eoi) {
          if (dictSize < 4096) {
            // new entry = prev ++ first(code)
            var f = code
            while (f >= clear + 2) f = prefix(f)
            prefix(dictSize) = prev; append(dictSize) = f.toByte
            entryLen(dictSize) = entryLen(prev) + 1
            dictSize += 1
            if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          if (!emit(code)) fail = true
          prev = code
        } else if (code == dictSize && dictSize < 4096) {
          // self-referential: entry = prev ++ first(prev)
          var f = prev
          while (f >= clear + 2) f = prefix(f)
          prefix(dictSize) = prev; append(dictSize) = f.toByte
          entryLen(dictSize) = entryLen(prev) + 1
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
          if (!emit(code)) fail = true
          prev = code
        } else fail = true
      }
    }
    if (fail || out < nPixels) return None
    // interlace: rows arrive in passes (0 step 8, 4 step 8, 2 step 4,
    // 1 step 2) — map source row order to display order
    val rowOrder: Array[Int] =
      if (!interlaced) Array.tabulate(h)(identity)
      else {
        val order = new Array[Int](h)
        var at = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); row <- start until h by step) {
          order(at) = row; at += 1
        }
        order
      }
    val rgb = new Array[Byte](nPixels * 3)
    var srcRow = 0
    while (srcRow < h) {
      val dispRow = rowOrder(srcRow)
      var x = 0
      while (x < w) {
        val idx = indices(srcRow * w + x) & 0xff
        if (idx >= palSize) return None
        val p = palOff + 3 * idx
        val d = (dispRow * w + x) * 3
        rgb(d) = b(p); rgb(d + 1) = b(p + 1); rgb(d + 2) = b(p + 2)
        x += 1
      }
      srcRow += 1
    }
    Some(PixelImage(w, h, 3, rgb))
  }

  // ---- TIFF --------------------------------------------------------

  /** Baseline TIFF 6.0 → pixels: 8 bits per sample, greyscale
    * (PhotometricInterpretation 1, SamplesPerPixel 1) or RGB
    * (photometric 2, 3 samples), chunky planar layout, either byte
    * order (`II`/`MM`), any strip split, and the four byte-oriented
    * compressions — none (1), LZW (5, the TIFF MSB-first early-change
    * flavor), Deflate (8 and the legacy 32946, via
    * `java.util.zip.Inflater`), and PackBits (32773) — plus the
    * horizontal-differencing predictor (tag 317 = 2). Strips decode
    * independently and must tile the image exactly; the predictor
    * resets per row. The IFD walk reads SHORT/LONG entry values
    * inline or through their offset per the spec's left-justified
    * value rule. Anything else — palette, planar, JPEG-in-TIFF,
    * 16-bit channels, tiled layout — returns None, never throws.
    */
  def tiffPixels(b: Array[Byte]): Option[PixelImage] = {
    if (b.length < 8) return None
    def u8(i: Int): Int = b(i) & 0xff
    val le = u8(0) == 'I' && u8(1) == 'I'
    if (!le && !(u8(0) == 'M' && u8(1) == 'M')) return None
    def u16(i: Int): Int =
      if (i < 0 || i + 2 > b.length) -1
      else if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (i < 0 || i + 4 > b.length) -1L
      else if (le) u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) | (u8(i + 2).toLong << 8) | u8(i + 3)
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = u16(ifd.toInt)
    if (n <= 0 || ifd + 2 + 12L * n > b.length) return None
    // entry value reader: SHORT (3) / LONG (4), inline when the total
    // payload fits the 4-byte value field (left-justified in either
    // byte order), through the offset otherwise
    def values(entry: Int): Option[Array[Long]] = {
      val typ = u16(entry + 2)
      val cnt = u32(entry + 4)
      val width = typ match { case 3 => 2L; case 4 => 4L; case _ => return None }
      if (cnt <= 0 || cnt > (1 << 20)) return None
      val base = if (cnt * width <= 4) entry + 8L else u32(entry + 8)
      if (base < 0 || base + cnt * width > b.length) return None
      val out = new Array[Long](cnt.toInt)
      var k = 0
      while (k < cnt) {
        out(k) = if (typ == 3) u16((base + 2 * k).toInt).toLong else u32((base + 4 * k).toInt)
        if (out(k) < 0) return None
        k += 1
      }
      Some(out)
    }
    var widthL = -1L; var heightL = -1L
    var comp = 1L; var photo = -1L; var spp = 1L; var planar = 1L
    var rps = -1L; var predictor = 1L
    var bits: Array[Long] = Array(1L) // default BitsPerSample = 1
    var stripOff: Array[Long] = null; var stripCnt: Array[Long] = null
    var e = ifd.toInt + 2
    var i = 0
    while (i < n) {
      val tag = u16(e)
      tag match {
        case 256 => widthL = values(e).flatMap(_.headOption).getOrElse(-1L)
        case 257 => heightL = values(e).flatMap(_.headOption).getOrElse(-1L)
        case 258 => bits = values(e).getOrElse(return None)
        case 259 => comp = values(e).flatMap(_.headOption).getOrElse(-1L)
        case 262 => photo = values(e).flatMap(_.headOption).getOrElse(-1L)
        case 273 => stripOff = values(e).getOrElse(return None)
        case 277 => spp = values(e).flatMap(_.headOption).getOrElse(-1L)
        case 278 => rps = values(e).flatMap(_.headOption).getOrElse(-1L)
        case 279 => stripCnt = values(e).getOrElse(return None)
        case 284 => planar = values(e).flatMap(_.headOption).getOrElse(-1L)
        case 317 => predictor = values(e).flatMap(_.headOption).getOrElse(-1L)
        case _ => () // the rest doesn't change the byte layout
      }
      e += 12
      i += 1
    }
    if (planar != 1L) return None
    if (predictor != 1L && predictor != 2L) return None
    val channels = (photo, spp) match {
      case (1L, 1L) => 1
      case (2L, 3L) => 3
      case _ => return None
    }
    if (bits.length != channels || bits.exists(_ != 8L)) return None
    if (widthL <= 0 || heightL <= 0 || widthL > (1 << 20) || heightL > (1 << 20)) return None
    val total = widthL * heightL * channels
    if (total > (1L << 30)) return None
    if (stripOff == null || stripCnt == null || stripOff.length != stripCnt.length) return None
    val w = widthL.toInt; val h = heightL.toInt
    val rowsPerStrip = if (rps <= 0 || rps > h) h else rps.toInt
    // strips must tile the height exactly
    if (stripOff.length != (h + rowsPerStrip - 1) / rowsPerStrip) return None
    val rowBytes = w * channels
    val out = new Array[Byte](total.toInt)
    var at = 0
    var s = 0
    while (s < stripOff.length) {
      val off = stripOff(s); val len = stripCnt(s)
      if (off < 0 || len < 0 || off + len > b.length) return None
      val rows = math.min(rowsPerStrip, h - s * rowsPerStrip)
      val expect = rows * rowBytes
      val got: Int = comp match {
        case 1L => // uncompressed: the strip IS the rows
          if (len != expect) return None
          System.arraycopy(b, off.toInt, out, at, expect)
          expect
        case 8L | 32946L => // Deflate (zlib stream)
          val inf = new java.util.zip.Inflater()
          try {
            inf.setInput(b, off.toInt, len.toInt)
            var g = 0
            while (g < expect && !inf.finished()) {
              val k = inf.inflate(out, at + g, expect - g)
              if (k == 0 && (inf.needsInput() || inf.needsDictionary())) return None
              g += k
            }
            g
          } catch { case _: java.util.zip.DataFormatException => return None }
          finally inf.end()
        case 5L => tiffLzw(b, off.toInt, len.toInt, out, at, expect).getOrElse(return None)
        case 32773L => packBits(b, off.toInt, len.toInt, out, at, expect).getOrElse(return None)
        case _ => return None
      }
      if (got != expect) return None
      // horizontal differencing: each sample stored as delta from the
      // sample one PIXEL left (same channel); resets every row
      if (predictor == 2L) {
        var r = 0
        while (r < rows) {
          val base = at + r * rowBytes
          var x = channels
          while (x < rowBytes) {
            out(base + x) = ((out(base + x) + out(base + x - channels)) & 0xff).toByte
            x += 1
          }
          r += 1
        }
      }
      at += expect
      s += 1
    }
    Some(PixelImage(w, h, channels, out))
  }

  /** TIFF-flavor LZW into `out[at, at+expect)`: MSB-first variable
    * 9..12-bit codes, clear 256 / EOI 257, dictionary from 258, and
    * the TIFF "early change" — the code width bumps one code EARLIER
    * than GIF's LSB-first flavor (when the next-free-entry index
    * reaches 511/1023/2047, matching libtiff's early-change decode).
    * Returns the byte count written, or None on malformed streams.
    */
  private def tiffLzw(b: Array[Byte], off: Int, len: Int,
                      out: Array[Byte], at: Int, expect: Int): Option[Int] = {
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    val entryLen = new Array[Int](4096)
    var j = 0
    while (j < 256) { prefix(j) = -1; append(j) = j.toByte; entryLen(j) = 1; j += 1 }
    var dictSize = 258
    var codeSize = 9
    var prev = -1
    var bitPos = 0
    val totalBits = len * 8
    var wrote = 0
    def emit(code: Int): Boolean = {
      val m = entryLen(code)
      if (wrote + m > expect) return false
      var c = code
      var p = at + wrote + m - 1
      while (c >= 258) { out(p) = append(c); p -= 1; c = prefix(c) }
      out(p) = c.toByte
      wrote += m
      true
    }
    var done = false
    while (!done) {
      if (bitPos + codeSize > totalBits) return None // no EOI seen
      var code = 0
      var k = 0
      while (k < codeSize) { // MSB-first across byte boundaries
        val bp = bitPos + k
        code = (code << 1) | ((b(off + (bp >> 3)) >> (7 - (bp & 7))) & 1)
        k += 1
      }
      bitPos += codeSize
      if (code == 256) { // clear
        dictSize = 258; codeSize = 9; prev = -1
      } else if (code == 257) { // EOI
        done = true
      } else if (prev == -1) {
        if (code >= 256) return None
        if (!emit(code)) return None
        prev = code
      } else if (code < dictSize && code != 256 && code != 257) {
        if (dictSize < 4096) {
          var f = code
          while (f >= 258) f = prefix(f)
          prefix(dictSize) = prev; append(dictSize) = f.toByte
          entryLen(dictSize) = entryLen(prev) + 1
          dictSize += 1
        }
        if (!emit(code)) return None
        prev = code
      } else if (code == dictSize && dictSize < 4096) {
        var f = prev
        while (f >= 258) f = prefix(f)
        prefix(dictSize) = prev; append(dictSize) = f.toByte
        entryLen(dictSize) = entryLen(prev) + 1
        dictSize += 1
        if (!emit(code)) return None
        prev = code
      } else return None
      // early change: width bumps when the NEXT code could not fit —
      // one entry before the table actually fills the current width
      // (decoder at 511/1023/2047; the encoder's table runs one entry
      // ahead and bumps at 512/1024/2048)
      if (!done && dictSize >= (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
      // all expected bytes produced: the strip is complete — don't
      // demand the trailing EOI (its width is ambiguous when the
      // dictionary lands exactly on a bump boundary, and `expect`
      // already bounds the output)
      if (wrote == expect) done = true
    }
    Some(wrote)
  }

  /** PackBits (TIFF Compression 32773) into `out[at, at+expect)`:
    * n in 0..127 copies n+1 literals, n in -127..-1 repeats the next
    * byte 1−n times, −128 is a no-op. Returns bytes written; None on
    * overrun or a truncated run.
    */
  private def packBits(b: Array[Byte], off: Int, len: Int,
                       out: Array[Byte], at: Int, expect: Int): Option[Int] = {
    var i = off
    val end = off + len
    var wrote = 0
    while (wrote < expect && i < end) {
      val ctl = b(i).toInt // signed
      i += 1
      if (ctl >= 0) {
        val m = ctl + 1
        if (i + m > end || wrote + m > expect) return None
        System.arraycopy(b, i, out, at + wrote, m)
        i += m; wrote += m
      } else if (ctl != -128) {
        val m = 1 - ctl
        if (i >= end || wrote + m > expect) return None
        java.util.Arrays.fill(out, at + wrote, at + wrote + m, b(i))
        i += 1; wrote += m
      }
    }
    Some(wrote)
  }

  /** pixels for any pure-JVM-decodable image format; None otherwise.
    *
    * This is the CORPUS-facing decode entry (imageTiles/imageHashes/
    * HeaderCodec run it once per row inside executor tasks), so the
    * VP8L path gets a 2^24-pixel cap (16 MP ≈ 64 MB RGBA — beyond any
    * curation-feature need) rather than the bitstream-expressible
    * 2^28: VP8L's LZ77 backrefs amplify ~3000× from a few hundred KB,
    * and one crafted row per task would otherwise transiently pin
    * ~1 GiB per executor thread. Direct [[Vp8lDecode.vp8lPixels]]
    * callers keep the spec-level bound.
    */
  def imagePixels(b: Array[Byte]): Option[PixelImage] =
    pngPixels(b).orElse(bmpPixels(b)).orElse(JpegDecode.jpegPixels(b))
      .orElse(gifPixels(b)).orElse(tiffPixels(b))
      .orElse(Vp8lDecode.vp8lPixels(b, maxPixels = 1L << 24))
      .orElse(Vp8Decode.vp8Pixels(b, maxPixels = 1L << 24))

  // ---- WAV container ----------------------------------------------

  /** RIFF/WAVE chunk walk shared by every WAV decoder: the FIRST
    * `fmt ` chunk (offset of its data area + declared size, full chunk
    * bounds-checked) and the FIRST `data` chunk (offset, length). The
    * walk steps in Long so a corrupt size field runs past the end of
    * the buffer instead of wrapping Int into a negative index; any
    * chunk size past the buffer, or a data chunk that does not fit,
    * is malformed → None.
    */
  private def riffWave(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String): Boolean =
      i >= 0 && i + s.length <= b.length && s.indices.forall(j => u8(i + j) == s.charAt(j))
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12L
    var fmt = -1; var fmtLen = 0
    var data = -1; var dataLen = 0
    while (i + 8 <= b.length && (fmt < 0 || data < 0)) {
      val at = i.toInt
      val size = le32(at + 4)
      if (size > b.length.toLong) return None
      if (tag(at, "fmt ") && fmt < 0 && size >= 16 && i + 8 + size <= b.length) {
        fmt = at + 8; fmtLen = size.toInt
      } else if (tag(at, "data") && data < 0) {
        data = at + 8; dataLen = size.toInt
      }
      i += 8L + size + (size & 1L)
    }
    if (fmt >= 0 && data >= 0 && dataLen >= 0 && data.toLong + dataLen <= b.length)
      Some((fmt, fmtLen, data, dataLen))
    else None
  }

  // ---- WAV PCM -----------------------------------------------------

  /** Linear PCM samples as the 16-bit view (interleaved across
    * channels): 16-bit LE as-is, 8-bit unsigned recentered
    * (`(v − 128) << 8`), 24/32-bit arithmetic-shifted down to 16 —
    * the same high-bits view [[graft.operators.FlacDecode]] uses for
    * non-16 depths. Accepts plain PCM (`wFormatTag` 1) and
    * WAVE_FORMAT_EXTENSIBLE (0xFFFE) whose SubFormat GUID leads with
    * the PCM tag — the standard container for > 2 channels and
    * > 16-bit depths.
    */
  def wavPcm16(b: Array[Byte]): Option[Array[Short]] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    riffWave(b) match {
      case Some((f, flen, off, len)) =>
        val fmtTag = le16(f)
        // EXTENSIBLE: the effective tag is the SubFormat GUID's leading
        // 2 bytes (PCM GUID = 00000001-0000-0010-8000-00AA00389B71)
        val eff = if (fmtTag == 0xFFFE && flen >= 40) le16(f + 24) else fmtTag
        val bits = if (eff == 1) le16(f + 14) else 0
        if (bits != 8 && bits != 16 && bits != 24 && bits != 32) return None
        val bw = bits / 8
        val n = len / bw
        val out = new Array[Short](n)
        var j = 0
        bits match {
          case 8 =>
            while (j < n) { out(j) = ((u8(off + j) - 128) << 8).toShort; j += 1 }
          case 16 =>
            while (j < n) { out(j) = (u8(off + 2 * j) | (u8(off + 2 * j + 1) << 8)).toShort; j += 1 }
          case 24 =>
            while (j < n) {
              val p = off + 3 * j
              val v = u8(p) | (u8(p + 1) << 8) | (b(p + 2).toInt << 16) // sign from the top byte
              out(j) = (v >> 8).toShort
              j += 1
            }
          case _ =>
            while (j < n) {
              val p = off + 4 * j
              val v = u8(p) | (u8(p + 1) << 8) | (u8(p + 2) << 16) | (b(p + 3).toInt << 24)
              out(j) = (v >> 16).toShort
              j += 1
            }
        }
        Some(out)
      case None => None
    }
  }

  // ---- WAV IMA ADPCM (wFormatTag 0x0011) ---------------------------

  // IMA/DVI ADPCM tables (public IMA ADPCM specification; identical
  // across every published implementation — the step table is the
  // 89-entry exponential ladder, the index table the 16-entry nibble
  // adjustment)
  private val AdpcmStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499,
    2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
    9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767)
  private val AdpcmIndex: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** IMA ADPCM (`wFormatTag 0x0011`) samples, interleaved across
    * channels like [[wavPcm16]]. Block layout per the IMA spec: each
    * `blockAlign`-byte block carries, per channel, a 4-byte header
    * (initial predictor int16 LE — emitted as that channel's first
    * sample — step index byte, reserved byte), then 4-byte data words
    * round-robin across channels, two nibbles per byte LOW nibble
    * first. Nibble decode: `diff = step/8 + b2·step + b1·step/2 +
    * b0·step/4`, sign bit 8 subtracts, predictor clamps to int16,
    * index moves by the index table and clamps to [0, 88]. Only full
    * blocks decode (a truncated tail block is dropped, matching the
    * chunked write shape); malformed headers (step index > 88,
    * `samplesPerBlock` exceeding the block's nibble capacity,
    * channels outside 1..8) return None, never throw.
    */
  def wavAdpcmSamples(b: Array[Byte]): Option[Array[Short]] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def s16(i: Int): Int = { val v = le16(i); if (v >= 0x8000) v - 0x10000 else v }
    val (fmt, data) = riffWave(b) match {
      case Some((f, flen, off, len)) if le16(f) == 0x11 && le16(f + 14) == 4 =>
        // IMA ADPCM, 4-bit; samplesPerBlock rides the fmt extension
        // (cbSize >= 2) — absent, derive it from the block geometry
        val ch = le16(f + 2)
        val blockAlign = le16(f + 12)
        val spb =
          if (flen >= 20 && le16(f + 16) >= 2) le16(f + 18)
          else if (ch > 0) (blockAlign - 4 * ch) * 2 / ch + 1
          else 0
        (Some((ch, blockAlign, spb)), Some((off, len)))
      case _ => (None, None)
    }
    (fmt, data) match {
      case (Some((ch, blockAlign, spb)), Some((off, len)))
          if ch >= 1 && ch <= 8 && blockAlign >= 4 * ch &&
            // data area must tile into 4-byte-per-channel words — the
            // standard IMA WAV block geometry; anything else would
            // walk the round-robin read out of the block
            (blockAlign - 4 * ch) % (4 * ch) == 0 &&
            spb >= 1 && spb <= (blockAlign - 4 * ch) * 2 / ch + 1 &&
            len >= 0 && off.toLong + len <= b.length =>
        val nBlocks = len / blockAlign
        // Long-sized first: spb·ch can reach ~2·blockAlign, so the
        // sample count approaches 2·len — which overflows Int for a
        // data chunk near 2 GB
        val total = nBlocks.toLong * spb * ch
        if (total > (1L << 30)) return None
        val out = new Array[Short](total.toInt)
        val pred = new Array[Int](ch)
        val idx = new Array[Int](ch)
        var blk = 0
        while (blk < nBlocks) {
          val base = off + blk * blockAlign
          var c = 0
          while (c < ch) {
            pred(c) = s16(base + 4 * c)
            idx(c) = u8(base + 4 * c + 2)
            if (idx(c) > 88) return None
            out((blk * spb) * ch + c) = pred(c).toShort
            c += 1
          }
          // data words: 4 bytes per channel round-robin; nibble t of
          // channel c is sample 1 + t of that channel within the block
          var t = 1 // per-channel sample cursor (0 was the header predictor)
          var w = 0 // round-robin word group index
          while (t < spb) {
            val groupBase = base + 4 * ch + w * 4 * ch
            var c2 = 0
            while (c2 < ch) {
              var k = 0
              while (k < 8 && t + k < spb) {
                val byte = u8(groupBase + c2 * 4 + k / 2)
                val n = if (k % 2 == 0) byte & 0xf else byte >>> 4
                val step = AdpcmStep(idx(c2))
                var diff = step >> 3
                if ((n & 4) != 0) diff += step
                if ((n & 2) != 0) diff += step >> 1
                if ((n & 1) != 0) diff += step >> 2
                val p = if ((n & 8) != 0) pred(c2) - diff else pred(c2) + diff
                pred(c2) = math.max(-32768, math.min(32767, p))
                idx(c2) = math.max(0, math.min(88, idx(c2) + AdpcmIndex(n)))
                out((blk * spb + t + k) * ch + c2) = pred(c2).toShort
                k += 1
              }
              c2 += 1
            }
            t += 8
            w += 1
          }
          blk += 1
        }
        Some(out)
      case _ => None
    }
  }

  // ---- WAV G.711 μ-law / A-law (wFormatTag 0x0007 / 0x0006) --------

  /** μ-law byte → linear PCM (ITU-T G.711 §4.2; the classic CCITT
    * expand form): complement, unpack the 3-bit exponent and 4-bit
    * mantissa around the 0x84 bias, re-shift, strip the bias. Output
    * range ±32124 — fits int16 exactly.
    */
  private def mulawExpand(x: Int): Int = {
    val u = ~x & 0xff
    val t = (((u & 0xf) << 3) + 0x84) << ((u >> 4) & 7)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** A-law byte → linear PCM (ITU-T G.711 §4.1): even-bit inversion
    * (XOR 0x55), segment 0 is linear with a half-step offset, higher
    * segments shift the 0x108-biased mantissa. A-law's sign bit SET
    * means positive (the opposite of μ-law). Output range ±32256.
    */
  private def alawExpand(x: Int): Int = {
    val a = x ^ 0x55
    val seg = (a >> 4) & 7
    val t =
      if (seg == 0) ((a & 0xf) << 4) + 8
      else (((a & 0xf) << 4) + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** G.711 companded WAV (`wFormatTag` 0x0007 μ-law / 0x0006 A-law,
    * 8 bits per sample) expanded to linear int16, interleaved across
    * channels like [[wavPcm16]]. Each byte is one sample — the expand
    * is a closed-form integer function of the byte, so the oracle
    * re-derives it in SQL directly. Wrong tag/bit depth or a data
    * chunk running past the buffer returns None, never throws.
    */
  def wavG711Samples(b: Array[Byte]): Option[Array[Short]] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val (fmtTag, data) = riffWave(b) match {
      case Some((f, _, off, len)) =>
        val t = le16(f)
        if ((t == 6 || t == 7) && le16(f + 14) == 8) (t, Some((off, len)))
        else (0, None)
      case None => (0, None)
    }
    data match {
      case Some((off, len)) if fmtTag != 0 && len >= 0 && off.toLong + len <= b.length =>
        val out = new Array[Short](len)
        var j = 0
        if (fmtTag == 7) while (j < len) { out(j) = mulawExpand(u8(off + j)).toShort; j += 1 }
        else while (j < len) { out(j) = alawExpand(u8(off + j)).toShort; j += 1 }
        Some(out)
      case _ => None
    }
  }

  /** samples for any pure-JVM-decodable WAV coding; None otherwise. */
  def wavSamples(b: Array[Byte]): Option[Array[Short]] =
    wavPcm16(b).orElse(wavAdpcmSamples(b)).orElse(wavG711Samples(b))

  /** samples for any pure-JVM-decodable audio format, as the 16-bit
    * view the RMS/peak features consume: WAV (PCM16, IMA-ADPCM) or
    * FLAC ([[FlacDecode]], native depth arithmetic-shifted to 16).
    */
  def audioSamples(b: Array[Byte]): Option[Array[Short]] =
    wavSamples(b).orElse(FlacDecode.flacSamples16(b))

  /** Root-mean-square amplitude normalized to [0, 1]. */
  def rms(samples: Array[Short]): Double =
    if (samples.isEmpty) 0.0
    else {
      var s = 0.0
      var i = 0
      while (i < samples.length) { val v = samples(i).toDouble; s += v * v; i += 1 }
      math.sqrt(s / samples.length) / 32768.0
    }

  /** Peak |amplitude| normalized to [0, 1]. */
  def peak(samples: Array[Short]): Double =
    if (samples.isEmpty) 0.0
    else samples.iterator.map(s => math.abs(s.toInt)).max / 32768.0

  /** One image analysis tile: INTEGER features only — pixel count,
    * per-channel sums, sum of squares and min/max of the G plane
    * (the contrast/blank-region signals). Mean/variance/range floats
    * derive downstream from these exact integers, so an offline SQL
    * engine can replay every value. Sub-3-channel images reuse the
    * gray plane for all three sums (the [[graft.operators.Multimodal]]
    * color-slot convention). */
  final case class ImageTile(tileX: Int, tileY: Int, nPx: Int,
                             sumR: Long, sumG: Long, sumB: Long,
                             sumSqG: Long, minG: Int, maxG: Int)

  /** Fixed-size tiling of a decoded image (edge tiles may be
    * smaller). Tiles scan row-major over the tile grid. */
  def tileFeatures(px: PixelImage, tile: Int): Seq[ImageTile] = {
    require(tile > 0, "tile size must be positive")
    val (gi, bi) = if (px.channels >= 3) (1, 2) else (0, 0)
    val tilesX = (px.width + tile - 1) / tile
    val tilesY = (px.height + tile - 1) / tile
    val out = new scala.collection.mutable.ArrayBuffer[ImageTile](tilesX * tilesY)
    var ty = 0
    while (ty < tilesY) {
      var tx = 0
      while (tx < tilesX) {
        val x1 = math.min((tx + 1) * tile, px.width)
        val y1 = math.min((ty + 1) * tile, px.height)
        var sumR = 0L; var sumG = 0L; var sumB = 0L; var sumSqG = 0L
        var minG = 255; var maxG = 0
        var y = ty * tile
        while (y < y1) {
          var x = tx * tile
          while (x < x1) {
            val base = (y * px.width + x) * px.channels
            val r = px.data(base) & 0xff
            val g = px.data(base + gi) & 0xff
            val b = px.data(base + bi) & 0xff
            sumR += r; sumG += g; sumB += b
            sumSqG += g.toLong * g
            if (g < minG) minG = g
            if (g > maxG) maxG = g
            x += 1
          }
          y += 1
        }
        val n = (x1 - tx * tile) * (y1 - ty * tile)
        out += ImageTile(tx, ty, n, sumR, sumG, sumB, sumSqG, minG, maxG)
        tx += 1
      }
      ty += 1
    }
    out.toSeq
  }

  /** 63-bit average-hash over the decoded image — the image near-dup
    * fingerprint (the visual analog of the text simhash family): the
    * image block-averages onto an 8×8 luma grid (integer luma
    * 299R+587G+114B, no scaling — comparisons are scale-invariant)
    * and bit i = cell i's floor-average luma strictly above the
    * global floor-average, for the first 63 row-major cells (63 bits
    * keep the value non-negative, matching the simhash63 block-join
    * convention). All-integer floor arithmetic, so an offline SQL
    * engine replays every bit. None when either dimension is below
    * the 8-cell grid. */
  def aHash63(px: PixelImage): Option[Long] = {
    if (px.width < 8 || px.height < 8) return None
    val (gi, bi) = if (px.channels >= 3) (1, 2) else (0, 0)
    val cellSum = new Array[Long](64)
    val cellN = new Array[Long](64)
    var y = 0
    while (y < px.height) {
      val cy = y * 8 / px.height
      var x = 0
      while (x < px.width) {
        val cx = x * 8 / px.width
        val base = (y * px.width + x) * px.channels
        val l = 299L * (px.data(base) & 0xff) +
          587L * (px.data(base + gi) & 0xff) +
          114L * (px.data(base + bi) & 0xff)
        val c = cy * 8 + cx
        cellSum(c) += l
        cellN(c) += 1
        x += 1
      }
      y += 1
    }
    var total = 0L
    var i = 0
    while (i < 64) { total += cellSum(i); i += 1 }
    val globalAvg = total / (px.width.toLong * px.height)
    var hash = 0L
    i = 0
    while (i < 63) {
      if (cellSum(i) / cellN(i) > globalAvg) hash |= 1L << i
      i += 1
    }
    Some(hash)
  }

  /** 63-bit energy-delta hash over decoded PCM — the audio near-dup
    * fingerprint completing the modality family (text simhash, image
    * [[aHash63]]): the clip block-averages onto a 64-cell energy grid
    * (per-cell floor-average of sample² — all-integer, overflow-free)
    * and bit i = cell i+1's average energy strictly above cell i's.
    * 63 bits keep the value non-negative for the simhash63 block
    * join. None below 64 samples (no grid). */
  def audioHash63(samples: Array[Short]): Option[Long] = {
    val n = samples.length
    if (n < 64) return None
    val sum = new Array[Long](64)
    val cnt = new Array[Long](64)
    var i = 0
    while (i < n) {
      val c = (i.toLong * 64 / n).toInt
      val v = samples(i).toLong
      sum(c) += v * v
      cnt(c) += 1
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 63) {
      if (sum(b + 1) / cnt(b + 1) > sum(b) / cnt(b)) h |= 1L << b
      b += 1
    }
    Some(h)
  }

  /** One audio analysis window: INTEGER features only — sample count,
    * zero-crossing count (negative↔non-negative flips between
    * consecutive samples within the window), sum of squares, and peak
    * magnitude. RMS/peak floats derive downstream from these exact
    * integers, so an offline SQL engine can replay every value. */
  final case class AudioWindow(winIdx: Int, nSamples: Int, zcr: Int,
                               sumSq: Long, peakAbs: Int)

  /** Fixed-size windowing (hop = size; the last window may be
    * shorter). Empty input → no windows. */
  def windowFeatures(samples: Array[Short], win: Int): Seq[AudioWindow] = {
    require(win > 0, "window size must be positive")
    val out = scala.collection.mutable.ArrayBuffer[AudioWindow]()
    var start = 0
    var idx = 0
    while (start < samples.length) {
      val end = math.min(start + win, samples.length)
      var zcr = 0
      var sumSq = 0L
      var peakAbs = 0
      var i = start
      while (i < end) {
        val v = samples(i).toInt
        sumSq += v.toLong * v
        if (math.abs(v) > peakAbs) peakAbs = math.abs(v)
        if (i > start && ((v < 0) != (samples(i - 1) < 0))) zcr += 1
        i += 1
      }
      out += AudioWindow(idx, end - start, zcr, sumSq, peakAbs)
      start += win
      idx += 1
    }
    out.toSeq
  }
}
