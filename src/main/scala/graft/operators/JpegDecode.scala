package graft.operators

import graft.operators.MediaDecode.PixelImage

/** Pure-JVM Huffman JPEG decoder (ITU-T T.81), sequential AND
  * progressive DCT — the formats of ~all web/camera JPEGs: marker
  * parse → entropy decode (streaming per block for baseline;
  * coefficient-buffered across scans for SOF2 with spectral selection
  * and successive approximation per Annex G) → dequant → 8×8 IDCT →
  * chroma upsample → integer YCbCr→RGB. Closes the last stubbed
  * content family in [[Multimodal.HeaderCodec]] (PNG/BMP/WAV already
  * decode for real in [[MediaDecode]]).
  *
  * Same corpus-scale contract as the rest of the module: supported
  * shapes decode exactly, everything else — arithmetic coding, 12-bit
  * precision, CMYK, lossless/hierarchical modes, truncated streams —
  * returns None, never throws. Determinism: the IDCT runs on a
  * fixed-order double butterfly against a StrictMath-derived constant
  * table and every other step is integer arithmetic, so decoded bytes
  * are identical on every JVM (the JDK's own ImageIO JPEG reader
  * rides platform libjpeg and cannot promise that; the test suite
  * uses it as an independent approximate oracle — for progressive it
  * also ENCODES the cross-validation inputs).
  *
  * Scope: baseline + extended-sequential (SOF0/SOF1) + progressive
  * (SOF2) Huffman, 8-bit, 1- or 3-component (greyscale / YCbCr /
  * stored-RGB via Adobe APP14 transform=0 or R,G,B component ids),
  * sampling factors 1–4 with restart-marker support; a
  * single-component scan decodes non-interleaved per T.81 A.2.
  * ~Every still produced by libjpeg/encoders fits this profile.
  */
object JpegDecode {

  /** decoded-plane footprint cap, the [[MediaDecode]] bomb guard. */
  private val MaxPixels = 1L << 26 // 64 Mpx ≈ 192 MB RGB

  // ---- bit reader over the entropy-coded segment ------------------

  /** Reads MSB-first bits with 0xFF00 byte-unstuffing; an RST marker
    * (FFD0-FFD7) or any other marker ends the current run — restart
    * alignment is handled by the MCU loop. Synthesized padding bits
    * (past end-of-data or at a marker) may be PREFETCHED into the
    * accumulator but never legally CONSUMED — a real stream's final
    * Huffman code ends inside real bytes (encoders 1-pad to the byte
    * boundary), so needing a synthesized bit means the stream is
    * truncated or the entropy data overruns its segment; the reader
    * bails rather than decode zero-bits into plausible garbage.
    * Throws Bail on exhaustion; the single driver catch maps it to
    * None.
    */
  private final class Bail extends RuntimeException { override def fillInStackTrace(): Throwable = this }
  private def bail(): Nothing = throw new Bail

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nBits = 0
    private var pad = 0 // synthesized bits currently in acc (always the newest)
    /** true if positioned AT a marker (FF xx, xx != 0). */
    def atMarker: Boolean =
      pos + 1 < b.length && (b(pos) & 0xff) == 0xff && b(pos + 1) != 0
    def markerCode: Int = b(pos + 1) & 0xff
    def skipMarker(): Unit = { pos += 2; acc = 0L; nBits = 0; pad = 0 }
    private def fill(): Unit = {
      while (nBits <= 56) {
        if (pos >= b.length) { acc <<= 8; nBits += 8; pad += 8 } // zero-pad past end
        else {
          val v = b(pos) & 0xff
          if (v == 0xff) {
            val nxt = if (pos + 1 < b.length) b(pos + 1) & 0xff else 0xd9
            if (nxt == 0) { acc = (acc << 8) | 0xffL; nBits += 8; pos += 2 } // stuffed FF
            else { acc <<= 8; nBits += 8; pad += 8 } // AT a marker: zero-pad, don't consume
          } else { acc = (acc << 8) | v; nBits += 8; pos += 1 }
        }
      }
    }
    def bit(): Int = {
      if (nBits == 0) fill()
      // pads only ever sit BELOW real bits (pos never advances once a
      // pad is emitted, until skipMarker resets), so the oldest
      // remaining bit is synthesized iff nothing but pads remain
      if (nBits <= pad) bail()
      nBits -= 1
      ((acc >>> nBits) & 1L).toInt
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  // ---- canonical Huffman table (Annex C) --------------------------

  private final class Huff(counts: Array[Int], vals: Array[Int]) {
    // minCode/maxCode/valPtr per code length 1..16
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = code - 1
        if (counts(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var code = r.bit()
      var l = 1
      while (l <= 16) {
        if (maxCode(l) >= code && code >= minCode(l))
          return vals(valPtr(l) + code - minCode(l))
        code = (code << 1) | r.bit()
        l += 1
      }
      bail()
    }
  }

  // ---- IDCT (separable, fixed-order double arithmetic) ------------

  /** c(u)·cos((2x+1)uπ/16) / 2, StrictMath so the table — and with it
    * every decoded byte — is identical on every JVM.
    */
  private val CosT: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
        t(u * 8 + x) = cu * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0) / 2.0
        x += 1
      }
      u += 1
    }
    t
  }

  /** in: dequantized coefficients (natural order); out: clamped +128
    * level-shifted samples 0..255.
    */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    // rows (u over columns)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(y * 8 + u) * CosT(u * 8 + x); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    // columns
    var x2 = 0
    while (x2 < 8) {
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += tmp(v * 8 + x2) * CosT(v * 8 + y2); v += 1 }
        val p = StrictMath.round(s).toInt + 128
        out(y2 * 8 + x2) = if (p < 0) 0 else if (p > 255) 255 else p
        y2 += 1
      }
      x2 += 1
    }
  }

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** sign-extend a RECEIVE'd magnitude (F.2.2.1 EXTEND). */
  @inline private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ---- component bookkeeping --------------------------------------

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: Huff = null
    var acTab: Huff = null
    var pred: Int = 0 // DC predictor
    var plane: Array[Byte] = null
    var planeW: Int = 0
    var planeH: Int = 0
    // progressive state: coefficients accumulate across scans, one
    // 64-int natural-order block at a time, over the PADDED MCU grid
    var coefs: Array[Int] = null
    var bw = 0; var bh = 0         // padded grid (interleaved scans)
    var bwSub = 0; var bhSub = 0   // true sub-image grid (non-interleaved)
  }

  /** Sequential or progressive Huffman JPEG → pixels (1 channel
    * greyscale or 3-channel RGB). None for any unsupported or
    * malformed shape.
    */
  def jpegPixels(b: Array[Byte]): Option[PixelImage] =
    try decode(b) catch { case _: Bail | _: ArrayIndexOutOfBoundsException => None }

  private def decode(b: Array[Byte]): Option[PixelImage] = {
    def u8(i: Int): Int = { if (i >= b.length) bail(); b(i) & 0xff }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None

    val qt = new Array[Array[Int]](4) // quant tables, natural order
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var adobeTransform = -1 // APP14 transform byte; -1 = no Adobe marker
    var progressive = false
    var scansSeen = 0

    def rgbDirectOf(): Boolean = comps.length == 3 &&
      (adobeTransform == 0 ||
        (adobeTransform == -1 &&
          comps(0).id == 'R' && comps(1).id == 'G' && comps(2).id == 'B'))

    var i = 2
    var jumped = false
    while (i + 4 <= b.length || (jumped && i + 2 <= b.length)) {
      jumped = false
      if (u8(i) != 0xff) return None
      val m = u8(i + 1)
      if (m == 0xd9) { // EOI
        if (!progressive || scansSeen == 0) return None
        if (comps.length == 3 && adobeTransform == 2) return None // YCCK
        return finishProgressive(comps, w, h, qt, rgbDirectOf())
      }
      val len = u16(i + 2)
      if (len < 2 || i + 2 + len > b.length) return None
      val seg = i + 4
      val segEnd = i + 2 + len
      m match {
        case 0xdb => // DQT: one or more tables
          var p = seg
          while (p < segEnd) {
            val pq = u8(p) >> 4; val tq = u8(p) & 0x0f
            if (pq != 0 || tq > 3) return None // 8-bit tables only
            if (p + 65 > segEnd) return None
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(ZigZag(k)) = u8(p + 1 + k); k += 1 }
            qt(tq) = t
            p += 65
          }
        case 0xc4 => // DHT: one or more tables
          var p = seg
          while (p < segEnd) {
            val tc = u8(p) >> 4; val th = u8(p) & 0x0f
            if (tc > 1 || th > 3 || p + 17 > segEnd) return None
            val counts = Array.tabulate(16)(k => u8(p + 1 + k))
            val total = counts.sum
            if (total > 256 || p + 17 + total > segEnd) return None
            val vals = Array.tabulate(total)(k => u8(p + 17 + k))
            val tab = new Huff(counts, vals)
            if (tc == 0) dcT(th) = tab else acT(th) = tab
            p += 17 + total
          }
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/1/2: sequential / progressive
          if (u8(seg) != 8) return None // 8-bit precision only
          progressive = m == 0xc2
          h = u16(seg + 1); w = u16(seg + 3)
          val nf = u8(seg + 5)
          if (w <= 0 || h <= 0 || (nf != 1 && nf != 3)) return None
          if (w.toLong * h > MaxPixels) return None
          comps = Array.tabulate(nf) { c =>
            val o = seg + 6 + 3 * c
            val hv = u8(o + 1)
            val comp = Comp(u8(o), hv >> 4, hv & 0x0f, u8(o + 2))
            if (comp.h < 1 || comp.h > 4 || comp.v < 1 || comp.v > 4 || comp.tq > 3)
              return None
            comp
          }
          if (progressive) {
            // coefficient-store GEOMETRY over the padded MCU grid;
            // the Int arrays themselves allocate at the first SOS
            // (a header-only file must not trigger the allocation)
            // under a BYTE-parity cap: coefficients are 4 bytes per
            // sample, so the element cap is a quarter of the plane
            // byte cap — the progressive ceiling is 32 Mpx, vs 64 Mpx
            // sequential (bomb guard, round-11 review)
            val maxH = comps.map(_.h).max; val maxV = comps.map(_.v).max
            val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
            val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
            comps.foreach { c =>
              c.bw = mcusX * c.h; c.bh = mcusY * c.v
              c.bwSub = ((w * c.h + maxH - 1) / maxH + 7) / 8
              c.bhSub = ((h * c.v + maxV - 1) / maxV + 7) / 8
              if (c.bw.toLong * c.bh * 64 > MaxPixels / 2) return None
            }
          }
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // lossless / arithmetic / hierarchical: unsupported
        case 0xdd => // DRI
          restartInterval = u16(seg)
        case 0xee => // APP14 (Adobe): transform 0 = components stored
          // directly (RGB for a 3-component frame), 1 = YCbCr, 2 = YCCK
          if (len >= 14 && u8(seg) == 'A' && u8(seg + 1) == 'd' && u8(seg + 2) == 'o' &&
              u8(seg + 3) == 'b' && u8(seg + 4) == 'e')
            adobeTransform = u8(seg + 11)
        case 0xda if progressive => // SOS: one progressive scan
          if (comps == null) return None
          val ns = u8(seg)
          if (ns < 1 || ns > comps.length) return None
          val scanComps = new Array[Comp](ns)
          var p = seg + 1
          var c = 0
          while (c < ns) {
            val cs = u8(p); val tt = u8(p + 1)
            val comp = comps.find(_.id == cs).getOrElse(return None)
            if (qt(comp.tq) == null) return None
            comp.dcTab = dcT(tt >> 4); comp.acTab = acT(tt & 0x0f)
            scanComps(c) = comp
            p += 2
            c += 1
          }
          val ss = u8(p); val se = u8(p + 1)
          val ah = u8(p + 2) >> 4; val al = u8(p + 2) & 0x0f
          // T.81 G.1: DC scans are the (0,0) band and may interleave;
          // AC scans are a single component over a band in 1..63
          if (ss == 0 && se != 0) return None
          if (ss > 0 && (ns != 1 || se < ss || se > 63)) return None
          if (al > 13 || ah > 13 || (ah != 0 && ah != al + 1)) return None
          if (ss == 0 && ah == 0 && scanComps.exists(_.dcTab == null)) return None
          if (ss > 0 && scanComps(0).acTab == null) return None
          comps.foreach(c => if (c.coefs == null) c.coefs = new Array[Int](c.bw * c.bh * 64))
          val maxH = comps.map(_.h).max; val maxV = comps.map(_.v).max
          val end = progressiveScan(b, segEnd, scanComps, w, h, maxH, maxV,
            ss, se, ah, al, restartInterval)
          scansSeen += 1
          i = end
          jumped = true
        case 0xda => // SOS: entropy-coded data follows (sequential)
          if (comps == null) return None
          val ns = u8(seg)
          if (ns != comps.length) return None
          var p = seg + 1
          var c = 0
          while (c < ns) {
            val cs = u8(p); val tt = u8(p + 1)
            val comp = comps.find(_.id == cs).getOrElse(return None)
            comp.dcTab = dcT(tt >> 4); comp.acTab = acT(tt & 0x0f)
            if (comp.dcTab == null || comp.acTab == null || qt(comp.tq) == null)
              return None
            p += 2
            c += 1
          }
          // T.81 A.2: a scan is interleaved only when Ns > 1. A
          // single-component scan is NON-interleaved — one 8×8 data
          // unit per MCU in plain raster order, sampling factors
          // irrelevant — so a greyscale frame that declares h/v > 1
          // (e.g. jpegtran -grayscale keeps the source's 4:2:0 luma
          // factors) must not be decoded as h×v block clusters.
          val scanComps =
            if (ns == 1 && (comps(0).h != 1 || comps(0).v != 1)) {
              val c0 = comps(0)
              val c1 = c0.copy(h = 1, v = 1)
              c1.dcTab = c0.dcTab; c1.acTab = c0.acTab
              Array(c1)
            } else comps
          // color identity: YCbCr unless the encoder says otherwise.
          // Adobe transform 0 on a 3-component frame, or raw 'R','G','B'
          // component ids with no Adobe marker, mean the planes are
          // stored RGB and must NOT go through the YCbCr matrix; YCCK
          // (transform 2) on 3 components is malformed.
          if (comps.length == 3 && adobeTransform == 2) return None
          return scan(b, segEnd, scanComps, w, h, qt, restartInterval, rgbDirectOf())
        case _ => () // APPn / COM / others: skip
      }
      if (!jumped) i += 2 + len
    }
    None
  }

  /** entropy-decode every MCU, reassemble planes, color-convert. */
  private def scan(b: Array[Byte], start: Int, comps: Array[Comp],
                   w: Int, h: Int, qt: Array[Array[Int]],
                   restartInterval: Int, rgbDirect: Boolean): Option[PixelImage] = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcuW = 8 * maxH
    val mcuH = 8 * maxV
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      if (c.planeW.toLong * c.planeH > MaxPixels * 2) return None
      c.plane = new Array[Byte](c.planeW * c.planeH)
    }
    val r = new BitReader(b, start)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // expect RSTn; resync by skipping it and resetting predictors
        if (!r.atMarker || (r.markerCode & 0xf8) != 0xd0) bail()
        r.skipMarker()
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qt(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // ---- decode one 8×8 block (F.2.1.3) ----
            java.util.Arrays.fill(coef, 0)
            val t = c.dcTab.decode(r)
            if (t > 15) bail()
            c.pred += extend(r.bits(t), t)
            coef(0) = c.pred * q(0)
            var k = 1
            while (k < 64) {
              val rs = c.acTab.decode(r)
              val run = rs >> 4; val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += run
                if (k > 63) bail()
                coef(ZigZag(k)) = extend(r.bits(size), size) * q(ZigZag(k))
                k += 1
              }
            }
            idct(coef, px)
            // place block into the component plane
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              val rowOff = (oy + yy) * c.planeW + ox
              while (xx < 8) { c.plane(rowOff + xx) = px(yy * 8 + xx).toByte; xx += 1 }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    assemble(comps, w, h, maxH, maxV, rgbDirect)
  }

  /** planes → image: chroma upsampling to full resolution and color
    * reconstruction — shared by the baseline (streaming) and
    * progressive (coefficient-buffered) paths.
    *
    * Factor-2 upsampling (the universal 4:2:0/4:2:2 case) uses the
    * centered TRIANGLE filter (out(2i) = (3·p(i)+p(i−1)+2)/4,
    * out(2i+1) = (3·p(i)+p(i+1)+2)/4, edges clamped — libjpeg's
    * "fancy" upsampling, separably per axis); other ratios replicate
    * nearest.
    */
  private def assemble(comps: Array[Comp], w: Int, h: Int,
                       maxH: Int, maxV: Int, rgbDirect: Boolean): Option[PixelImage] = {
    def upsampleAxis(src: Array[Byte], sw: Int, sh: Int, factor: Int,
                     horizontal: Boolean): (Array[Byte], Int, Int) = {
      if (factor == 1) return (src, sw, sh)
      val ow = if (horizontal) sw * factor else sw
      val oh = if (horizontal) sh else sh * factor
      val out = new Array[Byte](ow * oh)
      var y = 0
      while (y < oh) {
        var x = 0
        while (x < ow) {
          // source index along the scaled axis + the two triangle taps
          val t = if (horizontal) x else y
          val n = if (horizontal) sw else sh
          val c = t / factor
          val v =
            if (factor == 2) {
              val o = if ((t & 1) == 0) math.max(c - 1, 0) else math.min(c + 1, n - 1)
              val near = if (horizontal) src(y * sw + c) & 0xff else src(c * sw + x) & 0xff
              val other = if (horizontal) src(y * sw + o) & 0xff else src(o * sw + x) & 0xff
              (3 * near + other + 2) >> 2
            } else if (horizontal) src(y * sw + c) & 0xff
            else src(c * sw + x) & 0xff
          out(y * ow + x) = v.toByte
          x += 1
        }
        y += 1
      }
      (out, ow, oh)
    }
    def fullRes(c: Comp): (Array[Byte], Int) = {
      val (h1, w1, hh1) = upsampleAxis(c.plane, c.planeW, c.planeH, maxH / c.h, horizontal = true)
      val (v1, w2, _) = upsampleAxis(h1, w1, hh1, maxV / c.v, horizontal = false)
      (v1, w2)
    }

    // ---- color reconstruction ----
    if (comps.length == 1) {
      val c = comps(0)
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(c.plane, y * c.planeW, out, y * w, w)
        y += 1
      }
      Some(PixelImage(w, h, 1, out))
    } else {
      // exotic non-divisible sampling ratios (e.g. 3:2) are legal per
      // T.81 but unseen in practice — unsupported shape, not a crash
      if (comps.exists(c => maxH % c.h != 0 || maxV % c.v != 0)) return None
      if (rgbDirect) {
        // Adobe transform=0 / R,G,B component ids: planes ARE R,G,B
        val (rP, rW) = fullRes(comps(0))
        val (gP, gW) = fullRes(comps(1))
        val (bP, bW) = fullRes(comps(2))
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val o = (y * w + x) * 3
            out(o) = rP(y * rW + x)
            out(o + 1) = gP(y * gW + x)
            out(o + 2) = bP(y * bW + x)
            x += 1
          }
          y += 1
        }
        return Some(PixelImage(w, h, 3, out))
      }
      val (yP, yW) = fullRes(comps(0))
      val (bP, bW) = fullRes(comps(1))
      val (rP, rW) = fullRes(comps(2))
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val lum = yP(y * yW + x) & 0xff
          val pb = (bP(y * bW + x) & 0xff) - 128
          val pr = (rP(y * rW + x) & 0xff) - 128
          // CCIR 601 integer form (16-bit fixed point, round-half-up)
          var rr = lum + ((91881 * pr + 32768) >> 16)
          var gg = lum - ((22554 * pb + 46802 * pr + 32768) >> 16)
          var bb = lum + ((116130 * pb + 32768) >> 16)
          if (rr < 0) rr = 0 else if (rr > 255) rr = 255
          if (gg < 0) gg = 0 else if (gg > 255) gg = 255
          if (bb < 0) bb = 0 else if (bb > 255) bb = 255
          val o = (y * w + x) * 3
          out(o) = rr.toByte; out(o + 1) = gg.toByte; out(o + 2) = bb.toByte
          x += 1
        }
        y += 1
      }
      Some(PixelImage(w, h, 3, out))
    }
  }

  // ---- progressive (SOF2) scan decode (T.81 G.1.2 / Annex G) -------

  /** Decode ONE progressive scan into the components' coefficient
    * stores and return the byte position of the next marker.
    *
    * The four scan kinds: DC first (diff-coded predictors, shifted
    * left by Al — successive approximation), DC refinement (one raw
    * bit per block ORed in at Al), AC first (band Ss..Se with EOBn
    * run-length codes: EOBRUN = (1<<r)−1+bits(r) ends the block and
    * skips that many following blocks), AC refinement (the G.1.2.3
    * correction pass: a decoded nonzero places ±1<<Al at the next
    * zero-history position after skipping `run` of them; every
    * nonzero-history coefficient passed on the way — and the whole
    * remaining band during an EOB run — appends one correction bit).
    * Interleaved (DC, Ns>1) scans walk the padded MCU grid; single-
    * component scans walk the component's true block sub-grid in
    * raster order. RSTn resets predictors, EOB run, and bit alignment
    * every `restartInterval` units.
    */
  private def progressiveScan(b: Array[Byte], start: Int, scanComps: Array[Comp],
                              w: Int, h: Int, maxH: Int, maxV: Int,
                              ss: Int, se: Int, ah: Int, al: Int,
                              restartInterval: Int): Int = {
    val r = new BitReader(b, start)
    var eobrun = 0
    scanComps.foreach(_.pred = 0)

    def checkRestart(unit: Int): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        if (!r.atMarker || (r.markerCode & 0xf8) != 0xd0) bail()
        r.skipMarker()
        scanComps.foreach(_.pred = 0)
        eobrun = 0
      }

    def dcFirst(c: Comp, off: Int): Unit = {
      val t = c.dcTab.decode(r)
      if (t > 15) bail()
      c.pred += extend(r.bits(t), t)
      c.coefs(off) = c.pred << al
    }
    def dcRefine(c: Comp, off: Int): Unit =
      if (r.bit() == 1) c.coefs(off) |= 1 << al
    def acFirst(c: Comp, off: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = c.acTab.decode(r)
        val run = rs >> 4; val size = rs & 0x0f
        if (size == 0) {
          if (run == 15) k += 16 // ZRL
          else {
            eobrun = (1 << run) - 1 + (if (run > 0) r.bits(run) else 0)
            k = se + 1 // EOBn: this block ends here
          }
        } else {
          k += run
          if (k > se) bail()
          c.coefs(off + ZigZag(k)) = extend(r.bits(size), size) << al
          k += 1
        }
      }
    }
    def acRefine(c: Comp, off: Int): Unit = {
      val p1 = 1 << al
      val m1 = -1 << al
      def correct(idx: Int): Unit =
        if (r.bit() == 1 && (c.coefs(idx) & p1) == 0)
          c.coefs(idx) += (if (c.coefs(idx) >= 0) p1 else m1)
      var k = ss
      if (eobrun == 0) {
        var ended = false
        while (k <= se && !ended) {
          val rs = c.acTab.decode(r)
          var run = rs >> 4
          val size = rs & 0x0f
          var newVal = 0
          if (size == 0) {
            if (run < 15) {
              // EOB run INCLUDES this block: its tail still refines
              eobrun = (1 << run) + (if (run > 0) r.bits(run) else 0)
              ended = true
            } // else ZRL: pass 15 zero-history positions
          } else {
            if (size != 1) bail() // refinement codes only size 1
            newVal = if (r.bit() == 1) p1 else m1
          }
          if (!ended) {
            var placed = false
            while (k <= se && !placed) {
              val idx = off + ZigZag(k)
              if (c.coefs(idx) != 0) correct(idx)
              else if (run == 0) { if (newVal != 0) c.coefs(idx) = newVal; placed = true }
              else run -= 1
              k += 1
            }
            if (!placed && newVal != 0) bail() // run past Se with a pending value
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) { // the band tail only refines what exists
          val idx = off + ZigZag(k)
          if (c.coefs(idx) != 0) correct(idx)
          k += 1
        }
        eobrun -= 1
      }
    }

    if (scanComps.length > 1) {
      // interleaved: DC scans only — the padded MCU grid
      if (ss != 0) bail()
      val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
      val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
      var mcu = 0
      val n = mcusX * mcusY
      while (mcu < n) {
        checkRestart(mcu)
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              val off = ((my * c.v + by) * c.bw + mx * c.h + bx) * 64
              if (ah == 0) dcFirst(c, off) else dcRefine(c, off)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
    } else {
      // single component: the true sub-grid in raster order
      val c = scanComps(0)
      var blk = 0
      val n = c.bwSub * c.bhSub
      while (blk < n) {
        checkRestart(blk)
        val off = ((blk / c.bwSub) * c.bw + blk % c.bwSub) * 64
        if (ss == 0) { if (ah == 0) dcFirst(c, off) else dcRefine(c, off) }
        else { if (ah == 0) acFirst(c, off) else acRefine(c, off) }
        blk += 1
      }
    }
    // advance to the next true marker (stuffed FF00 and RSTn are
    // entropy bytes; anything else ends the scan)
    var p = r.pos
    while (p + 1 < b.length && !((b(p) & 0xff) == 0xff && {
      val nx = b(p + 1) & 0xff
      nx != 0 && nx != 0xff && (nx < 0xd0 || nx > 0xd7)
    })) p += 1
    if (p + 1 >= b.length) bail()
    p
  }

  /** all scans seen (EOI): dequantize + IDCT every stored block into
    * the component planes, then assemble exactly like the baseline.
    */
  private def finishProgressive(comps: Array[Comp], w: Int, h: Int,
                                qt: Array[Array[Int]],
                                rgbDirect: Boolean): Option[PixelImage] = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      val q = qt(c.tq)
      if (q == null || c.coefs == null) return None
      c.planeW = c.bw * 8
      c.planeH = c.bh * 8
      if (c.planeW.toLong * c.planeH > MaxPixels * 2) return None
      c.plane = new Array[Byte](c.planeW * c.planeH)
      var by = 0
      while (by < c.bh) {
        var bx = 0
        while (bx < c.bw) {
          val off = (by * c.bw + bx) * 64
          var k = 0
          while (k < 64) { coef(k) = c.coefs(off + k) * q(k); k += 1 }
          idct(coef, px)
          var yy = 0
          while (yy < 8) {
            val rowOff = (by * 8 + yy) * c.planeW + bx * 8
            var xx = 0
            while (xx < 8) { c.plane(rowOff + xx) = px(yy * 8 + xx).toByte; xx += 1 }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    assemble(comps, w, h, maxH, maxV, rgbDirect)
  }
}
