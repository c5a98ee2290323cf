package graft.operators

import graft.operators.MediaDecode.PixelImage

/** WebP-lossy (VP8) KEYFRAME decoder, written from the public VP8
  * bitstream spec (RFC 6386). Every standalone lossy .webp image is a
  * single VP8 keyframe, so intra-only coverage IS full coverage for
  * still images; inter-frame machinery (motion vectors, reference
  * buffers, golden/altref) only exists inside animations and is out
  * of scope here.
  *
  * Pipeline per §9-§15: boolean arithmetic decoder → frame +
  * per-macroblock headers (segmentation, loop-filter deltas,
  * quantizer indices, token-probability updates, intra modes) →
  * per-block token decode (tree-structured tokens with
  * band/context-conditioned probabilities) → dequantize → inverse
  * WHT (Y2 DC) + inverse DCT → intra prediction (16×16 / chroma 8×8 /
  * ten 4×4 submodes) → in-loop deblocking filter (normal + simple).
  * All-integer reconstruction: conformant decoders agree
  * byte-for-byte, and Vp8DecodeSpec pins this decoder against the
  * system libwebp decoder's Y/U/V planes on 23 goldens spanning the
  * keyframe feature space. The large spec constant tables live in
  * [[Vp8Tables]].
  *
  * Intra prediction reads UNFILTERED reconstructed neighbors; the
  * loop filter runs afterwards over the frame in raster MB order
  * (§15.1) — so decode is three passes: mode parse, reconstruct,
  * filter. Malformed or truncated input returns None, never throws.
  */
object Vp8Decode {

  /** Decoded planar output: full-res luma + half-res chroma. */
  final case class Yuv(w: Int, h: Int, y: Array[Byte], u: Array[Byte], v: Array[Byte])

  // ---- boolean decoder (§7) -----------------------------------------

  private final class Bool(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var value = 0
    private var range = 255
    private var bitCount = 0
    private var virtualBytes = 0
    // reads past the end deliver zero bytes — the priming reads and a
    // couple of tail-renorm reads are legitimate (the encoder's flush
    // pads 4 bytes, and tiny partitions prime past their end), but a
    // stream still consuming virtual bytes long after that is
    // malformed (mirrors libwebp's eof_ rejection)
    private def nextByte(): Int = {
      val v = if (pos < end) b(pos) & 0xff else { virtualBytes += 1; 0 }
      pos += 1
      v
    }
    def overrun: Boolean = virtualBytes > 8
    value = (nextByte() << 8) | nextByte()

    def bit(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= nextByte() }
      }
      ret
    }
    /** n-bit unsigned literal, MSB first (§7.4). */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(128); i += 1 }
      v
    }
    /** magnitude-then-sign literal (§9.3). */
    def signedLiteral(n: Int): Int = {
      val v = literal(n)
      if (bit(128) == 1) -v else v
    }
    def flagged(n: Int): Int = if (bit(128) == 1) signedLiteral(n) else 0
  }

  // ---- small spec tables (§8, §11, §13) ------------------------------

  private val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
  private val Bands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  // 16x16 / chroma modes
  private val DC_PRED = 0; private val V_PRED = 1; private val H_PRED = 2
  private val TM_PRED = 3; private val B_PRED = 4
  // 4x4 submodes
  private val B_DC = 0; private val B_TM = 1; private val B_VE = 2; private val B_HE = 3
  private val B_LD = 4; private val B_RD = 5; private val B_VR = 6; private val B_VL = 7
  private val B_HD = 8; private val B_HU = 9

  /** keyframe luma-mode tree + probs (§11.2). */
  private val KfYModeTree = Array(-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
  private val KfYModeProb = Array(145, 156, 163, 128)
  /** chroma-mode tree + keyframe probs (§11.2). */
  private val UvModeTree = Array(-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
  private val KfUvModeProb = Array(142, 114, 183)
  /** 4x4 submode tree (§11.2); probs are context-selected from
    * [[Vp8Tables.kfBModeProbs]] by (above, left) neighbor submodes. */
  private val BModeTree = Array(
    -B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12,
    -B_HE, 10, -B_RD, -B_VR, -B_LD, 14, -B_VL, 16, -B_HD, -B_HU)
  /** segment-id tree (§10). */
  private val SegTree = Array(2, 4, -0, -1, -2, -3)

  /** DCT token extra-bit probabilities + bases (§13.2). */
  private val Cat1 = Array(159)
  private val Cat2 = Array(165, 145)
  private val Cat3 = Array(173, 148, 140)
  private val Cat4 = Array(176, 155, 140, 135)
  private val Cat5 = Array(180, 157, 141, 134, 130)
  private val Cat6 = Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)

  private def treeRead(bd: Bool, tree: Array[Int], probs: Array[Int], probOff: Int): Int = {
    var i = tree(0 + bd.bit(probs(probOff)))
    while (i > 0) i = tree(i + bd.bit(probs(probOff + (i >> 1))))
    -i
  }

  // ---- container walk -------------------------------------------------

  /** Y/U/V planes from a WebP container holding a lossy `VP8 ` chunk
    * (simple or VP8X extended layout, first TOP-LEVEL chunk — animated
    * frames nest inside ANMF and correctly find none). None for
    * lossless/foreign/malformed bytes. */
  def vp8Yuv(b: Array[Byte], maxPixels: Long = 1L << 24): Option[Yuv] = {
    def u8(i: Int): Int = b(i) & 0xff
    def tag(i: Int, s: String): Boolean =
      i + s.length <= b.length && s.indices.forall(j => u8(i + j) == s.charAt(j))
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (b.length < 30 || !tag(0, "RIFF") || !tag(8, "WEBP")) return None
    val riffEnd = math.min(8L + le32(4), b.length.toLong)
    var at = 12L
    while (at + 8 <= riffEnd) {
      val size = le32(at.toInt + 4)
      val payload = at + 8
      if (size < 0 || payload + size > riffEnd) return None
      if (tag(at.toInt, "VP8 "))
        return decodeFrame(b, payload.toInt, (payload + size).toInt, maxPixels)
      at = payload + size + (size & 1)
    }
    None
  }

  /** RGB pixels from a lossy WebP. The YUV planes are the bit-exact,
    * golden-pinned output; this conversion to RGB is a REPRESENTATION
    * choice (BT.601 studio-swing inverse, integer fixed-point,
    * point-sampled chroma) documented rather than golden-matched —
    * libwebp's own RGB output additionally applies its "fancy
    * upsampling" interpolation, which is a presentation filter, not
    * part of the bitstream semantics. */
  def vp8Pixels(b: Array[Byte], maxPixels: Long = 1L << 24): Option[PixelImage] =
    vp8Yuv(b, maxPixels).map { yuv =>
      val w = yuv.w; val h = yuv.h
      val cw = (w + 1) >> 1
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val c = (yuv.y(y * w + x) & 0xff) - 16
          val d = (yuv.u((y >> 1) * cw + (x >> 1)) & 0xff) - 128
          val e = (yuv.v((y >> 1) * cw + (x >> 1)) & 0xff) - 128
          var r = (298 * c + 409 * e + 128) >> 8
          var g = (298 * c - 100 * d - 208 * e + 128) >> 8
          var bb = (298 * c + 516 * d + 128) >> 8
          if (r < 0) r = 0 else if (r > 255) r = 255
          if (g < 0) g = 0 else if (g > 255) g = 255
          if (bb < 0) bb = 0 else if (bb > 255) bb = 255
          val o = (y * w + x) * 3
          out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = bb.toByte
          x += 1
        }
        y += 1
      }
      PixelImage(w, h, 3, out)
    }

  // ---- frame decode ---------------------------------------------------

  private def clamp(v: Int, lo: Int, hi: Int): Int = if (v < lo) lo else if (v > hi) hi else v
  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def decodeFrame(b: Array[Byte], start: Int, end: Int,
                          maxPixels: Long): Option[Yuv] = {
    if (end - start < 10) return None
    def u8(i: Int): Int = b(i) & 0xff
    // uncompressed keyframe header (§9.1)
    val tag0 = u8(start) | (u8(start + 1) << 8) | (u8(start + 2) << 16)
    val keyframe = (tag0 & 1) == 0
    val version = (tag0 >> 1) & 7
    val part0Len = tag0 >> 5
    if (!keyframe || version > 3) return None
    if (u8(start + 3) != 0x9d || u8(start + 4) != 0x01 || u8(start + 5) != 0x2a) return None
    val w = (u8(start + 6) | (u8(start + 7) << 8)) & 0x3fff
    val h = (u8(start + 8) | (u8(start + 9) << 8)) & 0x3fff
    if (w == 0 || h == 0 || w.toLong * h > maxPixels) return None
    val part0 = start + 10
    if (part0 + part0Len > end || part0Len <= 0) return None
    val bd = new Bool(b, part0, part0 + part0Len)

    // ---- first-partition frame header (§9.2-§9.11) ----
    if (bd.literal(1) != 0) return None // color space must be CS_YUV
    bd.literal(1) // clamping hint — reconstruction clamps regardless

    // segmentation (§9.3)
    var segEnabled = false
    var segUpdateMap = false
    var segAbsValues = false
    val segQuant = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    if (bd.literal(1) == 1) {
      segEnabled = true
      segUpdateMap = bd.literal(1) == 1
      val updateData = bd.literal(1) == 1
      if (updateData) {
        segAbsValues = bd.literal(1) == 1
        var i = 0
        while (i < 4) { segQuant(i) = bd.flagged(7); i += 1 }
        i = 0
        while (i < 4) { segLf(i) = bd.flagged(6); i += 1 }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) {
          if (bd.bit(128) == 1) segTreeProbs(i) = bd.literal(8)
          i += 1
        }
      }
    }

    // loop filter (§9.4)
    val filterSimple = bd.literal(1) == 1
    val filterLevel = bd.literal(6)
    val sharpness = bd.literal(3)
    var lfDeltaEnabled = false
    val refLfDelta = new Array[Int](4)
    val modeLfDelta = new Array[Int](4)
    if (bd.literal(1) == 1) {
      lfDeltaEnabled = true
      if (bd.literal(1) == 1) {
        var i = 0
        while (i < 4) { if (bd.bit(128) == 1) refLfDelta(i) = bd.signedLiteral(6); i += 1 }
        i = 0
        while (i < 4) { if (bd.bit(128) == 1) modeLfDelta(i) = bd.signedLiteral(6); i += 1 }
      }
    }

    // token partitions (§9.5)
    val nParts = 1 << bd.literal(2)
    val partSizesAt = part0 + part0Len
    if (partSizesAt + 3 * (nParts - 1) > end) return None
    val partStart = new Array[Int](nParts)
    val partEnd = new Array[Int](nParts)
    var pAt = partSizesAt + 3 * (nParts - 1)
    var pi = 0
    while (pi < nParts) {
      val sz =
        if (pi == nParts - 1) end - pAt
        else u8(partSizesAt + 3 * pi) | (u8(partSizesAt + 3 * pi + 1) << 8) | (u8(partSizesAt + 3 * pi + 2) << 16)
      if (sz < 0 || pAt + sz > end) return None
      partStart(pi) = pAt
      partEnd(pi) = pAt + sz
      pAt += sz
      pi += 1
    }
    val parts = Array.tabulate(nParts)(i => new Bool(b, partStart(i), partEnd(i)))

    // quantizer indices (§9.6)
    val yAcQi = bd.literal(7)
    val yDcDelta = bd.flagged(4)
    val y2DcDelta = bd.flagged(4)
    val y2AcDelta = bd.flagged(4)
    val uvDcDelta = bd.flagged(4)
    val uvAcDelta = bd.flagged(4)

    // per-segment dequant factors (§9.6, §14.1)
    val dcQ = Vp8Tables.dcQ; val acQ = Vp8Tables.acQ
    val nSegs = if (segEnabled) 4 else 1
    val qY1dc = new Array[Int](nSegs); val qY1ac = new Array[Int](nSegs)
    val qY2dc = new Array[Int](nSegs); val qY2ac = new Array[Int](nSegs)
    val qUVdc = new Array[Int](nSegs); val qUVac = new Array[Int](nSegs)
    var s = 0
    while (s < nSegs) {
      val q =
        if (!segEnabled) yAcQi
        else if (segAbsValues) clamp(segQuant(s), 0, 127)
        else clamp(yAcQi + segQuant(s), 0, 127)
      qY1dc(s) = dcQ(clamp(q + yDcDelta, 0, 127))
      qY1ac(s) = acQ(q)
      qY2dc(s) = dcQ(clamp(q + y2DcDelta, 0, 127)) * 2
      qY2ac(s) = math.max(8, acQ(clamp(q + y2AcDelta, 0, 127)) * 155 / 100)
      qUVdc(s) = dcQ(clamp(q + uvDcDelta, 0, 117)) // value cap 132 = dcQ(117)
      qUVac(s) = acQ(clamp(q + uvAcDelta, 0, 127))
      s += 1
    }

    bd.literal(1) // refresh_entropy_probs — single frame, irrelevant

    // coefficient probability updates (§13.4)
    val probs = Vp8Tables.defaultCoeffProbs.clone()
    val upd = Vp8Tables.updateProbs
    var i = 0
    while (i < 1056) {
      if (bd.bit(upd(i)) == 1) probs(i) = bd.literal(8)
      i += 1
    }

    val mbSkipCoeff = bd.literal(1) == 1
    val probSkipFalse = if (mbSkipCoeff) bd.literal(8) else 0

    // ---- pass 1: per-MB modes (rest of partition 0, §10-§11) ----
    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4
    val nMb = mbW * mbH
    val mbSegment = new Array[Byte](nMb)
    val mbSkip = new Array[Boolean](nMb)
    val mbYMode = new Array[Byte](nMb)
    val mbUvMode = new Array[Byte](nMb)
    val mbSub = new Array[Byte](nMb * 16) // per-4x4 submodes (implied for non-B_PRED)
    val kfB = Vp8Tables.kfBModeProbs
    // submode context rows: above = bottom row of each MB column,
    // left = right column of the previous MB (reset to DC at row start)
    val aboveSub = new Array[Byte](mbW * 4) // init B_DC = 0
    val leftSub = new Array[Byte](4)
    val impliedSub = Array(B_DC, B_VE, B_HE, B_TM) // DC/V/H/TM → submode (§11.3)
    var mby = 0
    while (mby < mbH) {
      java.util.Arrays.fill(leftSub, B_DC.toByte)
      var mbx = 0
      while (mbx < mbW) {
        val mi = mby * mbW + mbx
        if (segEnabled && segUpdateMap)
          mbSegment(mi) = treeRead(bd, SegTree, segTreeProbs, 0).toByte
        if (mbSkipCoeff) mbSkip(mi) = bd.bit(probSkipFalse) == 1
        val ym = treeRead(bd, KfYModeTree, KfYModeProb, 0)
        mbYMode(mi) = ym.toByte
        if (ym == B_PRED) {
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val above = if (r == 0) aboveSub(mbx * 4 + c) else mbSub(mi * 16 + (r - 1) * 4 + c)
              val left = if (c == 0) leftSub(r) else mbSub(mi * 16 + r * 4 + c - 1)
              val sub = treeRead(bd, BModeTree, kfB, (above * 10 + left) * 9)
              mbSub(mi * 16 + r * 4 + c) = sub.toByte
              c += 1
            }
            r += 1
          }
        } else {
          java.util.Arrays.fill(mbSub, mi * 16, mi * 16 + 16, impliedSub(ym).toByte)
        }
        var k = 0
        while (k < 4) {
          aboveSub(mbx * 4 + k) = mbSub(mi * 16 + 12 + k)
          leftSub(k) = mbSub(mi * 16 + k * 4 + 3)
          k += 1
        }
        mbUvMode(mi) = treeRead(bd, UvModeTree, KfUvModeProb, 0).toByte
        mbx += 1
      }
      mby += 1
    }

    // ---- pass 2: tokens + reconstruction (unfiltered) ----
    // padded planes: one margin row on top (127) and one margin col on
    // the left (129); 4 extra cols on the right carry above-right
    // pixels for the rightmost MB. Prediction reads/writes these
    // directly — the margins ARE the §12.2 boundary values.
    val yStride = mbW * 16 + 5
    val cStride = mbW * 8 + 1
    val yP = new Array[Byte]((mbH * 16 + 1) * yStride)
    val uP = new Array[Byte]((mbH * 8 + 1) * cStride)
    val vP = new Array[Byte]((mbH * 8 + 1) * cStride)
    java.util.Arrays.fill(yP, 0, yStride, 127.toByte)
    java.util.Arrays.fill(uP, 0, cStride, 127.toByte)
    java.util.Arrays.fill(vP, 0, cStride, 127.toByte)
    var r0 = 1
    while (r0 <= mbH * 16) { yP(r0 * yStride) = 129.toByte; r0 += 1 }
    r0 = 1
    while (r0 <= mbH * 8) { uP(r0 * cStride) = 129.toByte; vP(r0 * cStride) = 129.toByte; r0 += 1 }

    // nonzero contexts (§13.3)
    val aboveNzY = new Array[Boolean](mbW * 4)
    val aboveNzU = new Array[Boolean](mbW * 2)
    val aboveNzV = new Array[Boolean](mbW * 2)
    val aboveNzY2 = new Array[Boolean](mbW)
    val leftNzY = new Array[Boolean](4)
    val leftNzU = new Array[Boolean](2)
    val leftNzV = new Array[Boolean](2)
    var leftNzY2 = false

    val coeffs = new Array[Int](16)
    val y2Out = new Array[Int](16)
    val blockHasCoeffs = new Array[Boolean](nMb) // drives inner-edge filtering

    /** §13.2-§13.3 token decode for one 4x4 block; returns "any
      * nonzero coefficient". Dequantized coefficients land in `out`
      * (natural order). */
    def decodeBlock(td: Bool, plane: Int, ctx0: Int, first: Int,
                    dqDC: Int, dqAC: Int, out: Array[Int]): Boolean = {
      java.util.Arrays.fill(out, 0)
      var n = first
      var ctx = ctx0
      var nonzero = false
      var skipEob = false
      while (n < 16) {
        val pOff = ((plane * 8 + Bands(n)) * 3 + ctx) * 11
        if (!skipEob && td.bit(probs(pOff)) == 0) return nonzero // EOB
        if (td.bit(probs(pOff + 1)) == 0) {
          ctx = 0; skipEob = true // DCT_0: no EOB at the next position
        } else {
          skipEob = false
          var v = 0
          if (td.bit(probs(pOff + 2)) == 0) { v = 1; ctx = 1 }
          else {
            ctx = 2
            if (td.bit(probs(pOff + 3)) == 0) {
              if (td.bit(probs(pOff + 4)) == 0) v = 2
              else v = 3 + td.bit(probs(pOff + 5))
            } else {
              def extra(base: Int, ps: Array[Int]): Int = {
                var e = 0
                var j = 0
                while (j < ps.length) { e = (e << 1) | td.bit(ps(j)); j += 1 }
                base + e
              }
              v = if (td.bit(probs(pOff + 6)) == 0) {
                if (td.bit(probs(pOff + 7)) == 0) extra(5, Cat1) else extra(7, Cat2)
              } else if (td.bit(probs(pOff + 8)) == 0) {
                if (td.bit(probs(pOff + 9)) == 0) extra(11, Cat3) else extra(19, Cat4)
              } else {
                if (td.bit(probs(pOff + 10)) == 0) extra(35, Cat5) else extra(67, Cat6)
              }
            }
          }
          if (td.bit(128) == 1) v = -v
          out(Zigzag(n)) = v * (if (n == 0) dqDC else dqAC)
          nonzero = true
        }
        n += 1
      }
      nonzero
    }

    // §14.3 inverse DCT (in-place input, adds into plane with clamp)
    def idctAdd(in: Array[Int], plane: Array[Byte], stride: Int, at: Int): Unit = {
      val tmp = new Array[Int](16)
      var c = 0
      while (c < 4) {
        val a1 = in(c) + in(8 + c)
        val b1 = in(c) - in(8 + c)
        val t1 = (in(4 + c) * 35468) >> 16
        val t2 = in(12 + c) + ((in(12 + c) * 20091) >> 16)
        val c1 = t1 - t2
        val t3 = in(4 + c) + ((in(4 + c) * 20091) >> 16)
        val t4 = (in(12 + c) * 35468) >> 16
        val d1 = t3 + t4
        tmp(c) = a1 + d1; tmp(12 + c) = a1 - d1
        tmp(4 + c) = b1 + c1; tmp(8 + c) = b1 - c1
        c += 1
      }
      var r = 0
      while (r < 4) {
        val o = r * 4
        val a1 = tmp(o) + tmp(o + 2)
        val b1 = tmp(o) - tmp(o + 2)
        val t1 = (tmp(o + 1) * 35468) >> 16
        val t2 = tmp(o + 3) + ((tmp(o + 3) * 20091) >> 16)
        val c1 = t1 - t2
        val t3 = tmp(o + 1) + ((tmp(o + 1) * 20091) >> 16)
        val t4 = (tmp(o + 3) * 35468) >> 16
        val d1 = t3 + t4
        val p = at + r * stride
        plane(p) = clip255((plane(p) & 0xff) + ((a1 + d1 + 4) >> 3)).toByte
        plane(p + 1) = clip255((plane(p + 1) & 0xff) + ((b1 + c1 + 4) >> 3)).toByte
        plane(p + 2) = clip255((plane(p + 2) & 0xff) + ((b1 - c1 + 4) >> 3)).toByte
        plane(p + 3) = clip255((plane(p + 3) & 0xff) + ((a1 - d1 + 4) >> 3)).toByte
        r += 1
      }
    }

    // §14.3 inverse Walsh-Hadamard (Y2 → 16 luma DCs)
    def iwht(in: Array[Int], out: Array[Int]): Unit = {
      val tmp = new Array[Int](16)
      var c = 0
      while (c < 4) {
        val a1 = in(c) + in(12 + c)
        val b1 = in(4 + c) + in(8 + c)
        val c1 = in(4 + c) - in(8 + c)
        val d1 = in(c) - in(12 + c)
        tmp(c) = a1 + b1; tmp(4 + c) = c1 + d1
        tmp(8 + c) = a1 - b1; tmp(12 + c) = d1 - c1
        c += 1
      }
      var r = 0
      while (r < 4) {
        val o = r * 4
        val a1 = tmp(o) + tmp(o + 3)
        val b1 = tmp(o + 1) + tmp(o + 2)
        val c1 = tmp(o + 1) - tmp(o + 2)
        val d1 = tmp(o) - tmp(o + 3)
        out(o) = (a1 + b1 + 3) >> 3; out(o + 1) = (c1 + d1 + 3) >> 3
        out(o + 2) = (a1 - b1 + 3) >> 3; out(o + 3) = (d1 - c1 + 3) >> 3
        r += 1
      }
    }

    def avg2(a: Int, b2: Int): Int = (a + b2 + 1) >> 1
    def avg3(a: Int, b2: Int, c: Int): Int = (a + 2 * b2 + c + 2) >> 2

    /** whole-block (16x16 luma / 8x8 chroma) prediction (§12.2). */
    def predictWhole(mode: Int, plane: Array[Byte], stride: Int, at: Int,
                     size: Int, hasAbove: Boolean, hasLeft: Boolean): Unit = {
      def px(r: Int, c: Int): Int = plane(at + r * stride + c) & 0xff
      def set(r: Int, c: Int, v: Int): Unit = plane(at + r * stride + c) = v.toByte
      mode match {
        case DC_PRED =>
          var sum = 0
          var shift = if (size == 16) 3 else 2
          if (hasAbove) { var c = 0; while (c < size) { sum += px(-1, c); c += 1 }; shift += 1 }
          if (hasLeft) { var r = 0; while (r < size) { sum += px(r, -1); r += 1 }; shift += 1 }
          val dc = if (!hasAbove && !hasLeft) 128 else (sum + (1 << (shift - 1))) >> shift
          var r = 0
          while (r < size) { var c = 0; while (c < size) { set(r, c, dc); c += 1 }; r += 1 }
        case V_PRED =>
          var r = 0
          while (r < size) { var c = 0; while (c < size) { set(r, c, px(-1, c)); c += 1 }; r += 1 }
        case H_PRED =>
          var r = 0
          while (r < size) { var c = 0; while (c < size) { set(r, c, px(r, -1)); c += 1 }; r += 1 }
        case TM_PRED =>
          val corner = px(-1, -1)
          var r = 0
          while (r < size) {
            var c = 0
            while (c < size) { set(r, c, clip255(px(r, -1) + px(-1, c) - corner)); c += 1 }
            r += 1
          }
        case _ =>
      }
    }

    /** 4x4 submode prediction (§12.3). `ar` = the four above-right
      * pixels (snapshotted per MB for the right column; read from the
      * plane otherwise). */
    def predictSub(mode: Int, plane: Array[Byte], stride: Int, at: Int,
                   ar: Array[Int]): Unit = {
      def px(r: Int, c: Int): Int = plane(at + r * stride + c) & 0xff
      def set(r: Int, c: Int, v: Int): Unit = plane(at + r * stride + c) = v.toByte
      val a0 = px(-1, 0); val a1 = px(-1, 1); val a2 = px(-1, 2); val a3 = px(-1, 3)
      val l0 = px(0, -1); val l1 = px(1, -1); val l2 = px(2, -1); val l3 = px(3, -1)
      val cnr = px(-1, -1)
      mode match {
        case B_DC =>
          val dc = (a0 + a1 + a2 + a3 + l0 + l1 + l2 + l3 + 4) >> 3
          var r = 0
          while (r < 4) { var c = 0; while (c < 4) { set(r, c, dc); c += 1 }; r += 1 }
        case B_TM =>
          var r = 0
          while (r < 4) {
            val lv = px(r, -1)
            var c = 0
            while (c < 4) { set(r, c, clip255(lv + px(-1, c) - cnr)); c += 1 }
            r += 1
          }
        case B_VE =>
          val v0 = avg3(cnr, a0, a1); val v1 = avg3(a0, a1, a2)
          val v2 = avg3(a1, a2, a3); val v3 = avg3(a2, a3, ar(0))
          var r = 0
          while (r < 4) { set(r, 0, v0); set(r, 1, v1); set(r, 2, v2); set(r, 3, v3); r += 1 }
        case B_HE =>
          val h0 = avg3(cnr, l0, l1); val h1 = avg3(l0, l1, l2)
          val h2 = avg3(l1, l2, l3); val h3 = avg3(l2, l3, l3)
          var c = 0
          while (c < 4) { set(0, c, h0); set(1, c, h1); set(2, c, h2); set(3, c, h3); c += 1 }
        case B_LD =>
          val a = Array(a0, a1, a2, a3, ar(0), ar(1), ar(2), ar(3))
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val i2 = r + c
              set(r, c, if (i2 < 6) avg3(a(i2), a(i2 + 1), a(i2 + 2)) else avg3(a(6), a(7), a(7)))
              c += 1
            }
            r += 1
          }
        case B_RD =>
          val pp = Array(l3, l2, l1, l0, cnr, a0, a1, a2, a3)
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) { val i2 = 3 + c - r; set(r, c, avg3(pp(i2), pp(i2 + 1), pp(i2 + 2))); c += 1 }
            r += 1
          }
        case B_VR =>
          set(0, 0, avg2(cnr, a0)); set(0, 1, avg2(a0, a1))
          set(0, 2, avg2(a1, a2)); set(0, 3, avg2(a2, a3))
          set(1, 0, avg3(l0, cnr, a0)); set(1, 1, avg3(cnr, a0, a1))
          set(1, 2, avg3(a0, a1, a2)); set(1, 3, avg3(a1, a2, a3))
          set(2, 0, avg3(l1, l0, cnr)); set(3, 0, avg3(l2, l1, l0))
          var c = 1
          while (c < 4) { set(2, c, px(0, c - 1)); set(3, c, px(1, c - 1)); c += 1 }
        case B_VL =>
          val a = Array(a0, a1, a2, a3, ar(0), ar(1), ar(2), ar(3))
          set(0, 0, avg2(a(0), a(1))); set(1, 0, avg3(a(0), a(1), a(2)))
          set(2, 0, avg2(a(1), a(2))); set(0, 1, avg2(a(1), a(2)))
          set(3, 0, avg3(a(1), a(2), a(3))); set(1, 1, avg3(a(1), a(2), a(3)))
          set(2, 1, avg2(a(2), a(3))); set(0, 2, avg2(a(2), a(3)))
          set(3, 1, avg3(a(2), a(3), a(4))); set(1, 2, avg3(a(2), a(3), a(4)))
          set(2, 2, avg2(a(3), a(4))); set(0, 3, avg2(a(3), a(4)))
          set(3, 2, avg3(a(3), a(4), a(5))); set(1, 3, avg3(a(3), a(4), a(5)))
          set(2, 3, avg3(a(4), a(5), a(6)))
          set(3, 3, avg3(a(5), a(6), a(7)))
        case B_HD =>
          val pp = Array(l3, l2, l1, l0, cnr, a0, a1, a2)
          set(3, 0, avg2(pp(0), pp(1))); set(3, 1, avg3(pp(0), pp(1), pp(2)))
          set(2, 0, avg2(pp(1), pp(2))); set(3, 2, avg2(pp(1), pp(2)))
          set(2, 1, avg3(pp(1), pp(2), pp(3))); set(3, 3, avg3(pp(1), pp(2), pp(3)))
          set(2, 2, avg2(pp(2), pp(3))); set(1, 0, avg2(pp(2), pp(3)))
          set(2, 3, avg3(pp(2), pp(3), pp(4))); set(1, 1, avg3(pp(2), pp(3), pp(4)))
          set(1, 2, avg2(pp(3), pp(4))); set(0, 0, avg2(pp(3), pp(4)))
          set(1, 3, avg3(pp(3), pp(4), pp(5))); set(0, 1, avg3(pp(3), pp(4), pp(5)))
          set(0, 2, avg3(pp(4), pp(5), pp(6)))
          set(0, 3, avg3(pp(5), pp(6), pp(7)))
        case B_HU =>
          set(0, 0, avg2(l0, l1)); set(0, 1, avg3(l0, l1, l2))
          set(0, 2, avg2(l1, l2)); set(1, 0, avg2(l1, l2))
          set(0, 3, avg3(l1, l2, l3)); set(1, 1, avg3(l1, l2, l3))
          set(1, 2, avg2(l2, l3)); set(2, 0, avg2(l2, l3))
          set(1, 3, avg3(l2, l3, l3)); set(2, 1, avg3(l2, l3, l3))
          set(2, 2, l3); set(2, 3, l3)
          set(3, 0, l3); set(3, 1, l3); set(3, 2, l3); set(3, 3, l3)
        case _ =>
      }
    }

    val arSnapshot = new Array[Int](4)
    mby = 0
    while (mby < mbH) {
      val td = parts(mby % nParts)
      java.util.Arrays.fill(leftNzY, false)
      java.util.Arrays.fill(leftNzU, false)
      java.util.Arrays.fill(leftNzV, false)
      // leftNzY2 deliberately persists across MB rows? No: resets.
      leftNzY2 = false
      var mbx = 0
      while (mbx < mbW) {
        val mi = mby * mbW + mbx
        val seg = if (segEnabled) mbSegment(mi).toInt else 0
        val ym = mbYMode(mi).toInt
        val hasY2 = ym != B_PRED
        val yAt = (mby * 16 + 1) * yStride + (mbx * 16 + 1)
        val cAt = (mby * 8 + 1) * cStride + (mbx * 8 + 1)

        // top margin of the 4 above-right columns: rightmost MB
        // replicates its last above pixel (libwebp/dixie rule); the
        // global top margin row already holds 127 for mby == 0
        if (mbx == mbW - 1 && mby > 0) {
          val last = yP(yAt - yStride + 15) & 0xff
          var k = 0
          while (k < 4) { yP(yAt - yStride + 16 + k) = last.toByte; k += 1 }
        }
        // snapshot above-right for the right-column subblocks: all of
        // them read the row ABOVE the MB, never current-MB pixels
        var k = 0
        while (k < 4) { arSnapshot(k) = yP(yAt - yStride + 16 + k) & 0xff; k += 1 }

        var anyCoeffs = false
        val y2nz: Boolean =
          if (!mbSkip(mi)) {
            if (hasY2) {
              val ctx = (if (aboveNzY2(mbx)) 1 else 0) + (if (leftNzY2) 1 else 0)
              val nz = decodeBlock(td, 1, ctx, 0, qY2dc(seg), qY2ac(seg), coeffs)
              iwht(coeffs, y2Out)
              aboveNzY2(mbx) = nz; leftNzY2 = nz
              if (nz) anyCoeffs = true
              nz
            } else false
          } else {
            // skipped MB: §13.3 — zero the contexts the MB owns; the
            // Y2 context is only touched when the MB HAS a Y2 block
            if (hasY2) { aboveNzY2(mbx) = false; leftNzY2 = false }
            false
          }
        if (mbSkip(mi)) {
          var j = 0
          while (j < 4) { aboveNzY(mbx * 4 + j) = false; leftNzY(j) = false; j += 1 }
          aboveNzU(mbx * 2) = false; aboveNzU(mbx * 2 + 1) = false
          aboveNzV(mbx * 2) = false; aboveNzV(mbx * 2 + 1) = false
          leftNzU(0) = false; leftNzU(1) = false
          leftNzV(0) = false; leftNzV(1) = false
        }

        // ---- luma ----
        if (ym == B_PRED) {
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val sbAt = yAt + (r * 4) * yStride + c * 4
              val ar =
                if (c == 3) { if (r == 0) arSnapshot else arSnapshot }
                else Array(
                  yP(sbAt - yStride + 4) & 0xff, yP(sbAt - yStride + 5) & 0xff,
                  yP(sbAt - yStride + 6) & 0xff, yP(sbAt - yStride + 7) & 0xff)
              predictSub(mbSub(mi * 16 + r * 4 + c).toInt, yP, yStride, sbAt, ar)
              if (!mbSkip(mi)) {
                val bi = r * 4 + c
                val ctx = (if (aboveNzY(mbx * 4 + c)) 1 else 0) + (if (leftNzY(r)) 1 else 0)
                val nz = decodeBlock(td, 3, ctx, 0, qY1dc(seg), qY1ac(seg), coeffs)
                aboveNzY(mbx * 4 + c) = nz; leftNzY(r) = nz
                if (nz) anyCoeffs = true
                idctAdd(coeffs, yP, yStride, sbAt)
              }
              c += 1
            }
            r += 1
          }
        } else {
          predictWhole(ym, yP, yStride, yAt, 16, mby > 0, mbx > 0)
          if (!mbSkip(mi)) {
            var r = 0
            while (r < 4) {
              var c = 0
              while (c < 4) {
                val ctx = (if (aboveNzY(mbx * 4 + c)) 1 else 0) + (if (leftNzY(r)) 1 else 0)
                val nz = decodeBlock(td, 0, ctx, 1, qY1dc(seg), qY1ac(seg), coeffs)
                coeffs(0) = y2Out(r * 4 + c)
                aboveNzY(mbx * 4 + c) = nz; leftNzY(r) = nz
                if (nz) anyCoeffs = true
                idctAdd(coeffs, yP, yStride, yAt + (r * 4) * yStride + c * 4)
                c += 1
              }
              r += 1
            }
          } else if (y2nz) { // cannot happen (skip ⇒ no tokens), kept for clarity
            ()
          }
        }
        // skipped non-B_PRED MBs still need the prediction written —
        // handled above (predictWhole runs regardless); skipped B_PRED
        // ran predictSub per subblock with zero residue. But a skipped
        // non-B_PRED MB must NOT add residue: decode loop above is
        // guarded by !mbSkip, so nothing to undo here.

        // ---- chroma ----
        val uvm = mbUvMode(mi).toInt
        predictWhole(uvm, uP, cStride, cAt, 8, mby > 0, mbx > 0)
        predictWhole(uvm, vP, cStride, cAt, 8, mby > 0, mbx > 0)
        if (!mbSkip(mi)) {
          var r = 0
          while (r < 2) {
            var c = 0
            while (c < 2) {
              val ctx = (if (aboveNzU(mbx * 2 + c)) 1 else 0) + (if (leftNzU(r)) 1 else 0)
              val nz = decodeBlock(td, 2, ctx, 0, qUVdc(seg), qUVac(seg), coeffs)
              aboveNzU(mbx * 2 + c) = nz; leftNzU(r) = nz
              if (nz) anyCoeffs = true
              idctAdd(coeffs, uP, cStride, cAt + (r * 4) * cStride + c * 4)
              c += 1
            }
            r += 1
          }
          r = 0
          while (r < 2) {
            var c = 0
            while (c < 2) {
              val ctx = (if (aboveNzV(mbx * 2 + c)) 1 else 0) + (if (leftNzV(r)) 1 else 0)
              val nz = decodeBlock(td, 2, ctx, 0, qUVdc(seg), qUVac(seg), coeffs)
              aboveNzV(mbx * 2 + c) = nz; leftNzV(r) = nz
              if (nz) anyCoeffs = true
              idctAdd(coeffs, vP, cStride, cAt + (r * 4) * cStride + c * 4)
              c += 1
            }
            r += 1
          }
        }
        blockHasCoeffs(mi) = anyCoeffs
        mbx += 1
      }
      mby += 1
    }

    // ---- pass 3: loop filter (§15), raster MB order ----
    if (filterLevel > 0) {
      def segLevel(seg: Int): Int =
        if (!segEnabled) filterLevel
        else if (segAbsValues) clamp(segLf(seg), 0, 63)
        else clamp(filterLevel + segLf(seg), 0, 63)

      def limits(level: Int): (Int, Int, Int, Int) = {
        var interior = level
        if (sharpness > 0) {
          interior >>= (if (sharpness > 4) 2 else 1)
          if (interior > 9 - sharpness) interior = 9 - sharpness
        }
        if (interior < 1) interior = 1
        val mbEdge = (level + 2) * 2 + interior
        val subEdge = level * 2 + interior
        val hev = if (level >= 40) 2 else if (level >= 15) 1 else 0 // keyframe row
        (interior, mbEdge, subEdge, hev)
      }

      def sc(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v

      // normal subblock filter across one edge; pixels at p±step
      def filterNormal(plane: Array[Byte], at: Int, step: Int,
                       interior: Int, edge: Int, hevT: Int, mbEdge: Boolean): Unit = {
        val p3 = plane(at - 4 * step) & 0xff; val p2 = plane(at - 3 * step) & 0xff
        val p1 = plane(at - 2 * step) & 0xff; val p0 = plane(at - step) & 0xff
        val q0 = plane(at) & 0xff; val q1 = plane(at + step) & 0xff
        val q2 = plane(at + 2 * step) & 0xff; val q3 = plane(at + 3 * step) & 0xff
        val mask =
          math.abs(p3 - p2) <= interior && math.abs(p2 - p1) <= interior &&
          math.abs(p1 - p0) <= interior && math.abs(q1 - q0) <= interior &&
          math.abs(q2 - q1) <= interior && math.abs(q3 - q2) <= interior &&
          math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= edge
        if (!mask) return
        val hev = math.abs(p1 - p0) > hevT || math.abs(q1 - q0) > hevT
        val ps1 = p1 - 128; val ps0 = p0 - 128
        val qs0 = q0 - 128; val qs1 = q1 - 128
        if (!mbEdge) {
          var f = if (hev) sc(ps1 - qs1) else 0
          f = sc(f + 3 * (qs0 - ps0))
          val f1 = sc(f + 4) >> 3
          val f2 = sc(f + 3) >> 3
          plane(at) = (sc(qs0 - f1) + 128).toByte
          plane(at - step) = (sc(ps0 + f2) + 128).toByte
          if (!hev) {
            val a = (f1 + 1) >> 1
            plane(at + step) = (sc(qs1 - a) + 128).toByte
            plane(at - 2 * step) = (sc(ps1 + a) + 128).toByte
          }
        } else {
          val ps2 = p2 - 128; val qs2 = q2 - 128
          var f = sc(ps1 - qs1)
          f = sc(f + 3 * (qs0 - ps0))
          if (hev) {
            val f1 = sc(f + 4) >> 3
            val f2 = sc(f + 3) >> 3
            plane(at) = (sc(qs0 - f1) + 128).toByte
            plane(at - step) = (sc(ps0 + f2) + 128).toByte
          } else {
            val a0 = sc((27 * f + 63) >> 7)
            var nq0 = sc(qs0 - a0); var np0 = sc(ps0 + a0)
            val a1 = sc((18 * f + 63) >> 7)
            val nq1 = sc(qs1 - a1); val np1 = sc(ps1 + a1)
            val a2 = sc((9 * f + 63) >> 7)
            val nq2 = sc(qs2 - a2); val np2 = sc(ps2 + a2)
            plane(at) = (nq0 + 128).toByte; plane(at - step) = (np0 + 128).toByte
            plane(at + step) = (nq1 + 128).toByte; plane(at - 2 * step) = (np1 + 128).toByte
            plane(at + 2 * step) = (nq2 + 128).toByte; plane(at - 3 * step) = (np2 + 128).toByte
          }
        }
      }

      def filterSimpleEdge(plane: Array[Byte], at: Int, step: Int, edge: Int): Unit = {
        val p1 = plane(at - 2 * step) & 0xff; val p0 = plane(at - step) & 0xff
        val q0 = plane(at) & 0xff; val q1 = plane(at + step) & 0xff
        if (math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 > edge) return
        val ps1 = p1 - 128; val ps0 = p0 - 128
        val qs0 = q0 - 128; val qs1 = q1 - 128
        var f = sc(ps1 - qs1)
        f = sc(f + 3 * (qs0 - ps0))
        val f1 = sc(f + 4) >> 3
        val f2 = sc(f + 3) >> 3
        plane(at) = (sc(qs0 - f1) + 128).toByte
        plane(at - step) = (sc(ps0 + f2) + 128).toByte
      }

      var my = 0
      while (my < mbH) {
        var mx = 0
        while (mx < mbW) {
          val mi = my * mbW + mx
          var level = segLevel(if (segEnabled) mbSegment(mi).toInt else 0)
          if (lfDeltaEnabled) {
            level += refLfDelta(0) // keyframes are INTRA_FRAME
            if (mbYMode(mi).toInt == B_PRED) level += modeLfDelta(0)
            level = clamp(level, 0, 63)
          }
          if (level > 0) {
            val (interior, mbEdgeL, subEdgeL, hevT) = limits(level)
            val inner = blockHasCoeffs(mi) || mbYMode(mi).toInt == B_PRED
            val yAt = (my * 16 + 1) * yStride + (mx * 16 + 1)
            val cAt = (my * 8 + 1) * cStride + (mx * 8 + 1)
            if (filterSimple) {
              if (mx > 0) { var r = 0; while (r < 16) { filterSimpleEdge(yP, yAt + r * yStride, 1, mbEdgeL); r += 1 } }
              if (inner) {
                var e = 4
                while (e < 16) {
                  var r = 0
                  while (r < 16) { filterSimpleEdge(yP, yAt + r * yStride + e, 1, subEdgeL); r += 1 }
                  e += 4
                }
              }
              if (my > 0) { var c = 0; while (c < 16) { filterSimpleEdge(yP, yAt + c, yStride, mbEdgeL); c += 1 } }
              if (inner) {
                var e = 4
                while (e < 16) {
                  var c = 0
                  while (c < 16) { filterSimpleEdge(yP, yAt + e * yStride + c, yStride, subEdgeL); c += 1 }
                  e += 4
                }
              }
            } else {
              // vertical edges (columns), left to right
              if (mx > 0) {
                var r = 0
                while (r < 16) { filterNormal(yP, yAt + r * yStride, 1, interior, mbEdgeL, hevT, mbEdge = true); r += 1 }
                r = 0
                while (r < 8) {
                  filterNormal(uP, cAt + r * cStride, 1, interior, mbEdgeL, hevT, mbEdge = true)
                  filterNormal(vP, cAt + r * cStride, 1, interior, mbEdgeL, hevT, mbEdge = true)
                  r += 1
                }
              }
              if (inner) {
                var e = 4
                while (e < 16) {
                  var r = 0
                  while (r < 16) { filterNormal(yP, yAt + r * yStride + e, 1, interior, subEdgeL, hevT, mbEdge = false); r += 1 }
                  e += 4
                }
                var r = 0
                while (r < 8) {
                  filterNormal(uP, cAt + r * cStride + 4, 1, interior, subEdgeL, hevT, mbEdge = false)
                  filterNormal(vP, cAt + r * cStride + 4, 1, interior, subEdgeL, hevT, mbEdge = false)
                  r += 1
                }
              }
              // horizontal edges (rows), top to bottom
              if (my > 0) {
                var c = 0
                while (c < 16) { filterNormal(yP, yAt + c, yStride, interior, mbEdgeL, hevT, mbEdge = true); c += 1 }
                c = 0
                while (c < 8) {
                  filterNormal(uP, cAt + c, cStride, interior, mbEdgeL, hevT, mbEdge = true)
                  filterNormal(vP, cAt + c, cStride, interior, mbEdgeL, hevT, mbEdge = true)
                  c += 1
                }
              }
              if (inner) {
                var e = 4
                while (e < 16) {
                  var c = 0
                  while (c < 16) { filterNormal(yP, yAt + e * yStride + c, yStride, interior, subEdgeL, hevT, mbEdge = false); c += 1 }
                  e += 4
                }
                var c = 0
                while (c < 8) {
                  filterNormal(uP, cAt + 4 * cStride + c, cStride, interior, subEdgeL, hevT, mbEdge = false)
                  filterNormal(vP, cAt + 4 * cStride + c, cStride, interior, subEdgeL, hevT, mbEdge = false)
                  c += 1
                }
              }
            }
          }
          mx += 1
        }
        my += 1
      }
    }

    // a partition that ran far past its end never came from a
    // conforming encoder — reject like the reference decoder does
    if (bd.overrun || parts.exists(_.overrun)) return None

    // ---- crop out of the padded planes ----
    val cw = (w + 1) >> 1
    val ch = (h + 1) >> 1
    val yOut = new Array[Byte](w * h)
    val uOut = new Array[Byte](cw * ch)
    val vOut = new Array[Byte](cw * ch)
    var r = 0
    while (r < h) { System.arraycopy(yP, (r + 1) * yStride + 1, yOut, r * w, w); r += 1 }
    r = 0
    while (r < ch) {
      System.arraycopy(uP, (r + 1) * cStride + 1, uOut, r * cw, cw)
      System.arraycopy(vP, (r + 1) * cStride + 1, vOut, r * cw, cw)
      r += 1
    }
    Some(Yuv(w, h, yOut, uOut, vOut))
  }
}
