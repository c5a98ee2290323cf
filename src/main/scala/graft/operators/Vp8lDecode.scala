package graft.operators

import MediaDecode.PixelImage

/** WebP-lossless (VP8L) pixel decode, pure JVM, written from the
  * public bitstream specification (RFC 9649 §4, "WebP Lossless
  * Bitstream Specification") — NOT a libwebp port. Covers the whole
  * format:
  *
  *  - canonical prefix codes (simple 1/2-symbol and normal, via the
  *    19-symbol code-length code with 16/17/18 repeats and the
  *    optional max-symbol trim),
  *  - LZ77 backward references (length/distance prefix-plus-extra-bits
  *    coding, the 120-entry 2D distance map),
  *  - the color cache (0x1e35a7bd multiplicative hash),
  *  - meta prefix groups via a recursively-coded entropy image,
  *  - all four transforms, inverted in reverse bitstream order:
  *    PREDICTOR (14 modes, exact edge rules: TR of the last column
  *    wraps to the first pixel of the SAME row), COLOR_TRANSFORM
  *    (signed 3.5 fixed-point deltas, blue keyed off the
  *    already-restored red),
  *    SUBTRACT_GREEN, and COLOR_INDEXING (delta-coded palette,
  *    sub-byte pixel bundling for ≤16-color palettes).
  *
  * Validation is two-sided (Vp8lDecodeSpec): a from-spec forward
  * encoder round-trips arbitrary images, and golden fixtures encoded
  * by an INDEPENDENT implementation (the system libwebp encoder,
  * driven offline) must decode byte-for-byte — the same
  * forward-encoder tactic PNG and FLAC used. Malformed, truncated, or
  * over-subscribed streams return None, never throw
  * (DecoderFuzzSpec); decoded footprint is Long-guarded before any
  * allocation.
  */
object Vp8lDecode {

  /** RGBA pixels from a WebP container holding a VP8L chunk — either
    * the simple layout `RIFF....WEBPVP8L<size><0x2f stream>` or the
    * extended (VP8X) layout, where metadata chunks (ICCP/EXIF/XMP/
    * ALPH…) precede the image chunk; the walk takes the first
    * TOP-LEVEL `VP8L` (animated files nest their frames inside ANMF,
    * so they correctly find none). Lossy `VP8 ` content returns None
    * here and decodes through [[Vp8Decode.vp8Pixels]] (r13), the
    * from-spec RFC 6386 keyframe decoder.
    *
    * `maxPixels` bounds the decoded footprint BEFORE allocation. The
    * default is the 14-bit dimension maximum the bitstream can even
    * express (2^28 px = 1 GiB RGBA) — the spec-level bound for direct
    * callers; the corpus-facing [[MediaDecode.imagePixels]] path
    * passes a much smaller cap, because a few hundred KB of LZ77
    * backrefs can legally inflate to the full 2^28 and one crafted
    * row per executor thread would transiently pin ~1 GiB each (r13,
    * closing the r12 ADVICE amplification item).
    */
  def vp8lPixels(b: Array[Byte], maxPixels: Long = 1L << 28): Option[PixelImage] = {
    def u8(i: Int): Int = b(i) & 0xff
    def tag(i: Int, s: String): Boolean =
      i + s.length <= b.length && s.indices.forall(j => u8(i + j) == s.charAt(j))
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (b.length < 26 || !tag(0, "RIFF") || !tag(8, "WEBP")) return None
    val riffEnd = math.min(8L + le32(4), b.length.toLong)
    // top-level chunk walk: tag(4) + size(4 LE) + payload padded to even
    var at = 12L
    while (at + 8 <= riffEnd) {
      val size = le32(at.toInt + 4)
      val payload = at + 8
      if (size < 0 || payload + size > riffEnd) return None
      if (tag(at.toInt, "VP8L")) {
        if (size < 5 || u8(payload.toInt) != 0x2f) return None // VP8L signature byte
        return decodeStream(b, payload.toInt + 1, (payload + size).toInt, maxPixels)
      }
      at = payload + size + (size & 1) // RIFF pads chunks to even
    }
    None
  }

  // ---- bit reader (LSB-first within bytes, like DEFLATE) -----------

  private final class BitReader(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bitBuf = 0L
    private var bitCnt = 0
    var bad = false
    def readBits(n: Int): Int = {
      while (bitCnt < n) {
        if (pos >= end) { bad = true; return 0 }
        bitBuf |= (b(pos) & 0xffL) << bitCnt
        bitCnt += 8
        pos += 1
      }
      val v = (bitBuf & ((1L << n) - 1)).toInt
      bitBuf >>>= n
      bitCnt -= n
      v
    }
    def readBit(): Int = readBits(1)
  }

  // ---- canonical prefix codes --------------------------------------

  /** MSB-first canonical decode over code lengths 1..15 (the JPEG /
    * FLAC count-offset walk; VP8L packs code bits most-significant
    * first into the LSB-first byte stream, like DEFLATE). A code with
    * exactly one used symbol reads ZERO bits per symbol; anything
    * incomplete or over-subscribed is invalid.
    */
  private final class PrefixCode(val single: Int, counts: Array[Int],
                                 firstCode: Array[Int], firstIdx: Array[Int],
                                 symbols: Array[Int]) {
    def read(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < 15) {
        code = (code << 1) | br.readBit()
        len += 1
        if (counts(len) > 0 && code - firstCode(len) < counts(len)) {
          if (code < firstCode(len)) { br.bad = true; return -1 }
          return symbols(firstIdx(len) + (code - firstCode(len)))
        }
      }
      br.bad = true
      -1
    }
  }

  /** Build from per-symbol lengths; None on Kraft violation. */
  private def buildCode(lengths: Array[Int]): Option[PrefixCode] = {
    var used = 0
    var lastSym = -1
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) < 0 || lengths(i) > 15) return None
      if (lengths(i) > 0) { used += 1; lastSym = i }
      i += 1
    }
    if (used == 0) return None
    if (used == 1) return Some(new PrefixCode(lastSym, null, null, null, null))
    val counts = new Array[Int](16)
    i = 0
    while (i < lengths.length) { if (lengths(i) > 0) counts(lengths(i)) += 1; i += 1 }
    // canonical first codes; completeness required (a multi-symbol
    // code must satisfy Kraft with equality — both over- and
    // under-subscribed length sets are invalid)
    var kraft = 0L
    var len = 1
    while (len <= 15) { kraft += counts(len).toLong << (15 - len); len += 1 }
    if (kraft != (1L << 15)) return None
    val firstCode = new Array[Int](16)
    val firstIdx = new Array[Int](16)
    var code = 0
    var idx = 0
    len = 1
    while (len <= 15) {
      firstCode(len) = code
      firstIdx(len) = idx
      code = (code + counts(len)) << 1
      idx += counts(len)
      len += 1
    }
    val symbols = new Array[Int](idx)
    val cursor = firstIdx.clone()
    i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) { symbols(cursor(lengths(i))) = i; cursor(lengths(i)) += 1 }
      i += 1
    }
    Some(new PrefixCode(-1, counts, firstCode, firstIdx, symbols))
  }

  /** code-length-code symbol order (spec §4.2.1.1). */
  private val CodeLengthOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or normal) for `alphabetSize`. */
  private def readPrefixCode(br: BitReader, alphabetSize: Int): Option[PrefixCode] = {
    if (br.readBit() == 1) {
      // simple: 1 or 2 symbols. Assignment is CANONICAL — bit 0 maps
      // to the SMALLER symbol value regardless of write order (an
      // encoder may list them either way; verified against the
      // system libwebp decoder on a swapped-order stream)
      val numSymbols = br.readBit() + 1
      val first8 = br.readBit()
      val s0 = br.readBits(if (first8 == 1) 8 else 1)
      if (numSymbols == 1) {
        if (br.bad || s0 >= alphabetSize) return None
        return Some(new PrefixCode(s0, null, null, null, null))
      }
      val s1 = br.readBits(8)
      if (br.bad || s0 >= alphabetSize || s1 >= alphabetSize || s0 == s1) return None
      val counts = new Array[Int](16); counts(1) = 2
      val firstCode = new Array[Int](16)
      val firstIdx = new Array[Int](16)
      val syms = if (s0 < s1) Array(s0, s1) else Array(s1, s0)
      return Some(new PrefixCode(-1, counts, firstCode, firstIdx, syms))
    }
    // normal: 3-bit lengths for the code-length code, in CodeLengthOrder
    val numCodes = br.readBits(4) + 4
    if (numCodes > CodeLengthOrder.length) return None
    val clcl = new Array[Int](19)
    var i = 0
    while (i < numCodes) { clcl(CodeLengthOrder(i)) = br.readBits(3); i += 1 }
    if (br.bad) return None
    val clCode = buildCode(clcl).getOrElse(return None)
    // optional trim: stop after maxSymbol code reads
    var maxSymbol =
      if (br.readBit() == 1) {
        val nbits = 2 + 2 * br.readBits(3)
        2 + br.readBits(nbits)
      } else alphabetSize
    if (maxSymbol > alphabetSize) return None // trim beyond the alphabet: invalid
    val lengths = new Array[Int](alphabetSize)
    var sym = 0
    var prevLen = 8
    while (sym < alphabetSize && maxSymbol > 0) {
      maxSymbol -= 1
      val c = clCode.read(br)
      if (br.bad || c < 0) return None
      if (c < 16) {
        lengths(sym) = c; sym += 1
        if (c != 0) prevLen = c
      } else {
        val (repLen, extra, base) = c match {
          case 16 => (prevLen, 2, 3)
          case 17 => (0, 3, 3)
          case 18 => (0, 7, 11)
          case _  => return None
        }
        var rep = base + br.readBits(extra)
        if (br.bad || sym + rep > alphabetSize) return None
        while (rep > 0) { lengths(sym) = repLen; sym += 1; rep -= 1 }
      }
    }
    if (br.bad) return None
    buildCode(lengths)
  }

  // ---- LZ77 length / distance --------------------------------------

  /** prefix-plus-extra-bits value (spec §4.2.1.2): codes 0-3 are
    * literal 1-4; above, (2+(c&1))<<extra + extra bits + 1. */
  private def copyValue(br: BitReader, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.readBits(extra) + 1
    }

  /** 120-entry 2D neighbor map for distance codes 1..120 (spec
    * §4.2.1.3), as (dx, dy); dist = dy*xsize + dx clamped to ≥1.
    * Validated against the independent system-libwebp encoder's
    * output in Vp8lDecodeSpec (backref-heavy goldens).
    */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def planeCodeToDistance(xsize: Int, code: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistMap(code - 1)
      val d = dy * xsize + dx
      if (d < 1) 1 else d
    }

  // ---- entropy-coded image -----------------------------------------

  /** One meta group's five codes. */
  private final class Group(val green: PrefixCode, val red: PrefixCode,
                            val blue: PrefixCode, val alpha: PrefixCode,
                            val dist: PrefixCode)

  /** Decode one entropy-coded image of w×h ARGB pixels (spec
    * "spatially-coded image"): optional color cache, optional meta
    * prefix image (top level only), prefix-code groups, literals /
    * backrefs / cache hits. Returns packed ARGB ints.
    */
  private def decodeImage(br: BitReader, w: Int, h: Int,
                          allowMeta: Boolean): Option[Array[Int]] = {
    if (w <= 0 || h <= 0) return None
    if (w.toLong * h > (1L << 28)) return None // 4 bytes/px → 1 GiB hard cap
    // color cache (size field must be 1..11 when the flag is set)
    val hasCache = br.readBit() == 1
    val cacheBits = if (hasCache) br.readBits(4) else 0
    if (br.bad || (hasCache && (cacheBits < 1 || cacheBits > 11))) return None
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    // meta prefix image (only the top-level ARGB image may recurse)
    var metaBits = 0
    var metaImg: Array[Int] = null
    var metaW = 0
    var numGroups = 1
    if (allowMeta && br.readBit() == 1) {
      metaBits = br.readBits(3) + 2
      metaW = (w + (1 << metaBits) - 1) >> metaBits
      val metaH = (h + (1 << metaBits) - 1) >> metaBits
      metaImg = decodeImage(br, metaW, metaH, allowMeta = false).getOrElse(return None)
      var mx = 0
      var i = 0
      while (i < metaImg.length) {
        val idx = (metaImg(i) >> 8) & 0xffff // (red << 8) | green
        if (idx > mx) mx = idx
        i += 1
      }
      numGroups = mx + 1
      if (numGroups > 65536) return None
    }
    val greenAlphabet = 256 + 24 + cacheSize
    val groups = new Array[Group](numGroups)
    var g = 0
    while (g < numGroups) {
      val green = readPrefixCode(br, greenAlphabet).getOrElse(return None)
      val red = readPrefixCode(br, 256).getOrElse(return None)
      val blue = readPrefixCode(br, 256).getOrElse(return None)
      val alpha = readPrefixCode(br, 256).getOrElse(return None)
      val dist = readPrefixCode(br, 40).getOrElse(return None)
      groups(g) = new Group(green, red, blue, alpha, dist)
      g += 1
    }
    val out = new Array[Int](w * h)
    var pos = 0
    var x = 0
    var y = 0
    @inline def insertCache(argb: Int): Unit =
      if (cache != null) cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
    var group = groups(0)
    var lastMetaRowCol = -1
    while (pos < out.length) {
      if (metaImg != null) {
        val cell = (y >> metaBits) * metaW + (x >> metaBits)
        if (cell != lastMetaRowCol) {
          lastMetaRowCol = cell
          val idx = (metaImg(cell) >> 8) & 0xffff
          group = groups(idx)
        }
      }
      val s = group.green.read(br)
      if (br.bad || s < 0) return None
      if (s < 256) {
        val r = group.red.read(br)
        val b2 = group.blue.read(br)
        val a = group.alpha.read(br)
        if (br.bad || r < 0 || b2 < 0 || a < 0) return None
        val argb = (a << 24) | (r << 16) | (s << 8) | b2
        out(pos) = argb
        insertCache(argb)
        pos += 1; x += 1; if (x == w) { x = 0; y += 1 }
      } else if (s < 256 + 24) {
        val length = copyValue(br, s - 256)
        val dcode = group.dist.read(br)
        if (br.bad || dcode < 0) return None
        val distCode = copyValue(br, dcode)
        val dist = planeCodeToDistance(w, distCode)
        if (br.bad || dist > pos || pos + length > out.length) return None
        var k = 0
        while (k < length) {
          val v = out(pos - dist)
          out(pos) = v
          insertCache(v)
          pos += 1; x += 1; if (x == w) { x = 0; y += 1 }
          k += 1
        }
      } else {
        val idx = s - 256 - 24
        if (cache == null || idx >= cacheSize) return None
        val v = cache(idx)
        out(pos) = v
        // the emitted pixel joins the cache state too (the reference
        // semantics insert EVERY decoded pixel before the next lookup)
        insertCache(v)
        pos += 1; x += 1; if (x == w) { x = 0; y += 1 }
      }
    }
    Some(out)
  }

  // ---- transforms ---------------------------------------------------

  private final case class Transform(kind: Int, bits: Int, data: Array[Int], dataW: Int)

  private val PREDICTOR = 0
  private val COLOR = 1
  private val SUBTRACT_GREEN = 2
  private val INDEXING = 3

  @inline private def avg2(a: Int, b: Int): Int = {
    // per-channel floor average, SWAR over the two pixels
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  @inline private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def addPixels(p: Int, pred: Int): Int = {
    // componentwise add mod 256
    val a = ((p >>> 24) + (pred >>> 24)) & 0xff
    val r = (((p >> 16) & 0xff) + ((pred >> 16) & 0xff)) & 0xff
    val g = (((p >> 8) & 0xff) + ((pred >> 8) & 0xff)) & 0xff
    val b = ((p & 0xff) + (pred & 0xff)) & 0xff
    (a << 24) | (r << 16) | (g << 8) | b
  }

  private def select(t: Int, l: Int, tl: Int): Int = {
    @inline def d(a: Int, b: Int, c: Int): Int = {
      val pb = b - c; val pa = a - c
      math.abs(pb) - math.abs(pa)
    }
    val s = d(t >>> 24, l >>> 24, tl >>> 24) +
      d((t >> 16) & 0xff, (l >> 16) & 0xff, (tl >> 16) & 0xff) +
      d((t >> 8) & 0xff, (l >> 8) & 0xff, (tl >> 8) & 0xff) +
      d(t & 0xff, l & 0xff, tl & 0xff)
    if (s <= 0) t else l
  }

  private def clampAddSubFull(l: Int, t: Int, tl: Int): Int = {
    @inline def c(a: Int, b: Int, cc: Int): Int = clip255(a + b - cc)
    (c(l >>> 24, t >>> 24, tl >>> 24) << 24) |
      (c((l >> 16) & 0xff, (t >> 16) & 0xff, (tl >> 16) & 0xff) << 16) |
      (c((l >> 8) & 0xff, (t >> 8) & 0xff, (tl >> 8) & 0xff) << 8) |
      c(l & 0xff, t & 0xff, tl & 0xff)
  }

  private def clampAddSubHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    // per channel: clip(ave + (ave - tl) / 2), / is trunc-toward-zero
    @inline def c(a: Int, b: Int): Int = clip255(a + (a - b) / 2)
    (c(ave >>> 24, tl >>> 24) << 24) |
      (c((ave >> 16) & 0xff, (tl >> 16) & 0xff) << 16) |
      (c((ave >> 8) & 0xff, (tl >> 8) & 0xff) << 8) |
      c(ave & 0xff, tl & 0xff)
  }

  /** inverse PREDICTOR: residuals += per-block-mode prediction.
    * Pixel (0,0) predicts opaque black; row 0 is forced mode L,
    * column 0 mode T; TR of the last column is `px(i - w + 1)`,
    * which lands on the FIRST pixel of the current row (already
    * decoded) — no special case needed.
    */
  private def inversePredictor(px: Array[Int], w: Int, h: Int,
                               bits: Int, modes: Array[Int], modesW: Int): Unit = {
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(i - 1) // L
          else if (x == 0) px(i - w) // T
          else {
            // the mode image's green channel is a full byte; only the
            // LOW 4 BITS select the predictor (mode byte 24 acts as
            // predictor 8), and the two table sentinels 14/15 predict
            // opaque black — both verified against the system libwebp
            // decoder on handcrafted mode bytes 24/14/15/30/31
            val mode = (modes((y >> bits) * modesW + (x >> bits)) >> 8) & 0xf
            val l = px(i - 1)
            val t = px(i - w)
            val tl = px(i - w - 1)
            val tr = px(i - w + 1) // at x = w-1 this is (0, y): current row's first pixel
            mode match {
              case 1  => l
              case 2  => t
              case 3  => tr
              case 4  => tl
              case 5  => avg2(avg2(l, tr), t)
              case 6  => avg2(l, tl)
              case 7  => avg2(l, t)
              case 8  => avg2(tl, t)
              case 9  => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => select(t, l, tl)
              case 12 => clampAddSubFull(l, t, tl)
              case 13 => clampAddSubHalf(l, t, tl)
              case _  => 0xff000000 // 0 and the 14/15 sentinels
            }
          }
        px(i) = addPixels(px(i), pred)
        i += 1
        x += 1
      }
      y += 1
    }
  }

  /** inverse COLOR_TRANSFORM: per-block signed 3.5 fixed deltas; red
    * restores first, blue keys off the RESTORED red (spec order). */
  private def inverseColorTransform(px: Array[Int], w: Int, h: Int,
                                    bits: Int, cts: Array[Int], ctsW: Int): Unit = {
    @inline def delta(t: Int, c: Int): Int = ((t.toByte * c.toByte) >> 5)
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val ct = cts((y >> bits) * ctsW + (x >> bits))
        val g2r = ct & 0xff          // stored in the blue channel
        val g2b = (ct >> 8) & 0xff   // stored in the green channel
        val r2b = (ct >> 16) & 0xff  // stored in the red channel
        val p = px(i)
        val g = (p >> 8) & 0xff
        var r = (p >> 16) & 0xff
        var b = p & 0xff
        r = (r + delta(g2r, g)) & 0xff
        b = (b + delta(g2b, g) + delta(r2b, r)) & 0xff
        px(i) = (p & 0xff00ff00) | (r << 16) | b
        i += 1
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      px(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  /** pixels-per-packed-pixel exponent for a palette of `size`. */
  private def bundleXBits(size: Int): Int =
    if (size <= 2) 3 else if (size <= 4) 2 else if (size <= 16) 1 else 0

  // ---- top level ----------------------------------------------------

  private def decodeStream(b: Array[Byte], start: Int, end: Int,
                           maxPixels: Long): Option[PixelImage] = {
    val br = new BitReader(b, start, end)
    val w = br.readBits(14) + 1
    val h = br.readBits(14) + 1
    br.readBit() // alpha_is_used hint — not needed for decode
    if (br.readBits(3) != 0) return None // version must be 0
    if (br.bad) return None
    if (w.toLong * h > maxPixels) return None
    // transforms (top level only), each kind at most once
    var transforms: List[Transform] = Nil
    var seen = 0
    var curW = w // COLOR_INDEXING reduces the coded width for later reads
    var guard = 0
    while (guard < 5 && br.readBit() == 1) {
      guard += 1
      val kind = br.readBits(2)
      if (br.bad || (seen & (1 << kind)) != 0) return None
      seen |= 1 << kind
      kind match {
        case PREDICTOR | COLOR =>
          val bits = br.readBits(3) + 2
          val tw = (curW + (1 << bits) - 1) >> bits
          val th = (h + (1 << bits) - 1) >> bits
          val img = decodeImage(br, tw, th, allowMeta = false).getOrElse(return None)
          transforms ::= Transform(kind, bits, img, tw)
        case SUBTRACT_GREEN =>
          transforms ::= Transform(kind, 0, null, 0)
        case INDEXING =>
          val size = br.readBits(8) + 1
          val raw = decodeImage(br, size, 1, allowMeta = false).getOrElse(return None)
          // palette entries are componentwise delta-coded
          var i = 1
          while (i < size) { raw(i) = addPixels(raw(i), raw(i - 1)); i += 1 }
          val xb = bundleXBits(size)
          transforms ::= Transform(INDEXING, xb, raw, size)
          curW = (curW + (1 << xb) - 1) >> xb
      }
      // a 5th transform bit set would necessarily repeat a kind and
      // fail the `seen` check above — no extra bit read needed here
    }
    if (br.bad) return None
    var px = decodeImage(br, curW, h, allowMeta = true).getOrElse(return None)
    var pxW = curW
    // invert in reverse bitstream order (transforms list is already
    // last-read-first)
    var ts = transforms
    while (ts.nonEmpty) {
      val t = ts.head
      ts = ts.tail
      t.kind match {
        case SUBTRACT_GREEN => inverseSubtractGreen(px)
        case PREDICTOR      => inversePredictor(px, pxW, h, t.bits, t.data, t.dataW)
        case COLOR          => inverseColorTransform(px, pxW, h, t.bits, t.data, t.dataW)
        case INDEXING =>
          val size = t.dataW
          val xb = t.bits
          val bpp = 8 >> xb           // index bits per pixel
          val mask = (1 << bpp) - 1
          val outW = w                // indexing always restores the full width
          val out = new Array[Int](outW * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < outW) {
              val packed = px(y * pxW + (x >> xb))
              val idx = ((packed >> 8) >> ((x & ((1 << xb) - 1)) * bpp)) & mask
              // out-of-range index decodes as TRANSPARENT BLACK, not a
              // reject — the reference decoder zero-extends the color
              // map (verified against system libwebp on a 3-entry
              // palette with a bundled index of 3)
              out(y * outW + x) = if (idx >= size) 0x00000000 else t.data(idx)
              x += 1
            }
            y += 1
          }
          px = out
          pxW = outW
      }
    }
    if (pxW != w) return None
    // ARGB ints → interleaved RGBA bytes
    val data = new Array[Byte](w * h * 4)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      data(4 * i) = ((p >> 16) & 0xff).toByte
      data(4 * i + 1) = ((p >> 8) & 0xff).toByte
      data(4 * i + 2) = (p & 0xff).toByte
      data(4 * i + 3) = ((p >>> 24) & 0xff).toByte
      i += 1
    }
    Some(PixelImage(w, h, 4, data))
  }
}
