package graft.operators

/** From-spec WARC (ISO 28500 / WARC 1.0–1.1) record parsing — the
  * ingest seam for web-crawl corpora, where the dominant training-data
  * source ships as WARC files of HTTP captures. The parser rebuilds a
  * file's record map (type, target URI, block byte range) and splits
  * HTTP response payloads into header/body, so downstream extraction
  * is byte-range slicing over bytes the scan already read — the same
  * 100 TB shape as [[MediaHeaders.mp4Samples]]: narrow map-only
  * fan-out, select/slice here, heavyweight work elsewhere. Both
  * archive compressions decode here — per-record gzip members
  * (`.warc.gz`, [[gunzip]]) and per-record zstd frames with an
  * optional shared dictionary (`.warc.zst`, [[unzstd]]) — so every
  * facet operator reads either layout through one entry
  * ([[warcRecordsAny]]).
  *
  * Malformed input — wrong magic, unparseable or missing mandatory
  * headers, truncated blocks, missing record separators — returns
  * None for the whole buffer, never throws: a corrupt file must
  * degrade, never kill the task (`DecoderFuzzSpec` pins this).
  */
object WebArchive {

  /** One record of a parsed WARC file.
    *
    * @param idx            0-based record ordinal
    * @param warcType       mandatory `WARC-Type` value
    * @param targetUri      `WARC-Target-URI`, "" when absent
    * @param contentLength  mandatory `Content-Length` (block bytes)
    * @param httpStatus     HTTP status for response records whose
    *                       block parses as HTTP/1.x; -1 otherwise
    * @param headerOffset   byte offset of the record's `WARC/` line
    * @param bodyOffset     byte offset of the HTTP body (response
    *                       records) or of the whole block otherwise
    * @param bodyLength     bytes from bodyOffset to block end
    * @param transferEncoding lowercased HTTP `Transfer-Encoding`
    *                       value ("" when absent / not HTTP) — real
    *                       crawl captures store the body AS SENT, so
    *                       `chunked` framing must be undone before
    *                       the payload is usable
    * @param contentEncoding lowercased HTTP `Content-Encoding`
    *                       value ("" when absent / not HTTP)
    * @param payloadDigest  `WARC-Payload-Digest` value ("" when
    *                       absent) — the content-identity key. On a
    *                       `revisit` record it POINTS at the original
    *                       capture whose payload this re-fetch
    *                       repeated (the body is headers-only), so
    *                       resolving revisits is a digest-keyed join
    *                       back to the originals
    * @param contentType    HTTP `Content-Type` media type, lowercased
    *                       with parameters (`; charset=…`) stripped
    *                       ("" when absent / not HTTP) — the mime
    *                       column of a CDX index row, and the cheap
    *                       pre-filter before body decode (text/html
    *                       vs octet streams)
    * @param location       HTTP `Location` header, trimmed but
    *                       case-preserved ("" when absent / not
    *                       HTTP) — with a 3xx status this is a
    *                       redirect edge, the raw material for
    *                       redirect-chain resolution before URL-keyed
    *                       dedup
    */
  final case class WarcRec(idx: Int, warcType: String, targetUri: String,
                           contentLength: Long, httpStatus: Int,
                           headerOffset: Long, bodyOffset: Long, bodyLength: Long,
                           transferEncoding: String = "", contentEncoding: String = "",
                           payloadDigest: String = "", contentType: String = "",
                           location: String = "")

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** index just past the next CRLF at/after `from`, or -1. Lines are
    * capped (a header line longer than 64 KiB is not a WARC header —
    * bail instead of scanning an adversarial buffer to its end). */
  private def lineEnd(b: Array[Byte], from: Int, limit: Int): Int = {
    val cap = math.min(limit.toLong, from.toLong + 65536).toInt
    var i = from
    while (i + 1 < cap) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i + 2
      i += 1
    }
    -1
  }

  /** Parse every record of a WARC buffer, or None if any part of the
    * grammar fails. `maxRecords` bounds output on adversarial input
    * (a 1 GiB file of empty records is 20M+ rows). */
  def warcRecords(b: Array[Byte], maxRecords: Int = 1 << 20): Option[Vector[WarcRec]] = {
    val n = b.length
    if (n == 0) return None
    val out = Vector.newBuilder[WarcRec]
    var count = 0
    var o = 0
    while (o < n) {
      if (count >= maxRecords) return None
      val headerOffset = o
      // version line: WARC/1.<digit>\r\n
      val vEnd = lineEnd(b, o, n)
      if (vEnd < 0) return None
      val version = new String(b, o, vEnd - 2 - o, Ascii)
      if (!version.startsWith("WARC/1.") || version.length != 8 ||
        !version.charAt(7).isDigit) return None
      o = vEnd
      // named headers until the empty line
      var warcType: String = null
      var targetUri = ""
      var contentLength = -1L
      var payloadDigest = ""
      var done = false
      while (!done) {
        val e = lineEnd(b, o, n)
        if (e < 0) return None
        if (e - o == 2) { done = true; o = e }
        else {
          val line = new String(b, o, e - 2 - o, Ascii)
          val colon = line.indexOf(':')
          if (colon <= 0) return None
          val name = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          name match {
            case "warc-type" => warcType = value
            case "warc-target-uri" => targetUri = value
            case "warc-payload-digest" => payloadDigest = value
            case "content-length" =>
              if (value.isEmpty || value.length > 18 || !value.forall(_.isDigit))
                return None
              contentLength = value.toLong
            case _ => () // other headers are legal and ignored
          }
          o = e
        }
      }
      if (warcType == null || contentLength < 0) return None
      val blockStart = o
      val blockEnd = blockStart.toLong + contentLength
      if (blockEnd > n) return None // truncated block
      // response payloads: split the HTTP message; anything that
      // doesn't parse as HTTP/1.x degrades to the whole block
      var httpStatus = -1
      var bodyOffset = blockStart.toLong
      var bodyLength = contentLength
      var transferEnc = ""
      var contentEnc = ""
      var contentTyp = ""
      var locationHdr = ""
      if (warcType.equalsIgnoreCase("response") && contentLength >= 12 &&
        b(blockStart) == 'H' && b(blockStart + 1) == 'T' && b(blockStart + 2) == 'T' &&
        b(blockStart + 3) == 'P' && b(blockStart + 4) == '/') {
        val se = lineEnd(b, blockStart, blockEnd.toInt)
        if (se > 0) {
          val status = new String(b, blockStart, se - 2 - blockStart, Ascii)
          val parts = status.split(" ", 3)
          if (parts.length >= 2 && parts(1).length == 3 && parts(1).forall(_.isDigit)) {
            // walk the header lines to the terminator, capturing the
            // two body-framing headers on the way (header names are
            // case-insensitive per RFC 9110 §5.1)
            var h = se
            var bodyAt = -1
            var te = ""
            var ce = ""
            var ct = ""
            var loc = ""
            while (bodyAt < 0 && h < blockEnd) {
              val e = lineEnd(b, h, blockEnd.toInt)
              if (e < 0) h = blockEnd.toInt
              else if (e - h == 2) bodyAt = e
              else {
                val line = new String(b, h, e - 2 - h, Ascii)
                val colon = line.indexOf(':')
                if (colon > 0) {
                  val nm = line.substring(0, colon).trim.toLowerCase
                  if (nm == "transfer-encoding") te = line.substring(colon + 1).trim.toLowerCase
                  else if (nm == "content-encoding") ce = line.substring(colon + 1).trim.toLowerCase
                  else if (nm == "content-type") {
                    val v = line.substring(colon + 1)
                    val semi = v.indexOf(';')
                    ct = (if (semi >= 0) v.substring(0, semi) else v).trim.toLowerCase
                  }
                  else if (nm == "location") loc = line.substring(colon + 1).trim
                }
                h = e
              }
            }
            if (bodyAt > 0) {
              httpStatus = parts(1).toInt
              bodyOffset = bodyAt.toLong
              bodyLength = blockEnd - bodyAt
              transferEnc = te
              contentEnc = ce
              contentTyp = ct
              locationHdr = loc
            }
          }
        }
      }
      out += WarcRec(count, warcType, targetUri, contentLength, httpStatus,
        headerOffset.toLong, bodyOffset, bodyLength, transferEnc, contentEnc,
        payloadDigest, contentTyp, locationHdr)
      count += 1
      // record separator: \r\n\r\n (exact EOF after the block is
      // tolerated — the last record of a stream-cut file)
      o = blockEnd.toInt
      if (o < n) {
        if (o + 4 > n || b(o) != '\r' || b(o + 1) != '\n' ||
          b(o + 2) != '\r' || b(o + 3) != '\n') return None
        o += 4
      }
    }
    Some(out.result())
  }

  /** The UTF-8 text of a record's body range — the slice step for
    * extraction pipelines that want the payload in the same pass. */
  def bodyString(b: Array[Byte], rec: WarcRec): String =
    new String(b, rec.bodyOffset.toInt, rec.bodyLength.toInt,
      java.nio.charset.StandardCharsets.UTF_8)

  // ---- gzip (RFC 1952) member walk: crawl archives ship as
  //      `.warc.gz` with ONE MEMBER PER RECORD (the seekable layout);
  //      per the RFC, a multi-member file decodes as the
  //      concatenation of its members' output. The deflate payload
  //      goes through `java.util.zip.Inflater` (the PNG/TIFF tactic);
  //      this walk owns the member grammar — header flags, optional
  //      fields, CRC32 + ISIZE trailer verification — and the
  //      decompression-bomb cap. ----

  def isGzip(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 0x1f.toByte && b(1) == 0x8b.toByte

  /** Decompress every gzip member and concatenate their output, or
    * None on any malformation: bad magic/method, reserved flag bits,
    * truncated optional fields, corrupt deflate data, CRC32 or ISIZE
    * trailer mismatch, trailing garbage after the last member, or
    * total output past `maxOut` (checked DURING inflation — a
    * crafted 4 GiB-of-zeros member bails at the cap, it never
    * allocates). */
  def gunzip(b: Array[Byte], maxOut: Int = 1 << 28): Option[Array[Byte]] =
    gunzipWalk(b, maxOut, null)

  /** [[gunzip]] plus the per-member boundary map the walk already
    * knows: each member's COMPRESSED byte range in `b` and its
    * output's range in the decompressed stream — what a CDX serving
    * row needs to range-read ONE record out of a `.warc.gz` without
    * touching the rest of the file. */
  def gunzipMembers(b: Array[Byte], maxOut: Int = 1 << 28):
      Option[(Array[Byte], Vector[MemberRange])] = {
    val members = Vector.newBuilder[MemberRange]
    gunzipWalk(b, maxOut, (co, cl, oo, ol) => members += MemberRange(co, cl, oo, ol))
      .map(raw => (raw, members.result()))
  }

  /** One compressed member of an archive file: its byte range in the
    * COMPRESSED file (`compOff`/`compLen`) and its output's range in
    * the decompressed stream (`outOff`/`outLen`). */
  final case class MemberRange(compOff: Long, compLen: Long, outOff: Long, outLen: Long)

  private def gunzipWalk(b: Array[Byte], maxOut: Int,
                         onMember: (Long, Long, Long, Long) => Unit): Option[Array[Byte]] = {
    if (!isGzip(b)) return None
    val out = new java.io.ByteArrayOutputStream(math.min(b.length, 1 << 16))
    var o = 0
    while (o < b.length) {
      val memberStart = o
      val outStart = out.size()
      // fixed header
      if (o + 10 > b.length || b(o) != 0x1f.toByte || b(o + 1) != 0x8b.toByte ||
        b(o + 2) != 8) return None
      val flg = b(o + 3) & 0xff
      if ((flg & 0xe0) != 0) return None // reserved bits
      o += 10 // magic, CM, FLG, MTIME(4), XFL, OS
      if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
        if (o + 2 > b.length) return None
        val xlen = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        o += 2 + xlen
        if (o > b.length) return None
      }
      if ((flg & 8) != 0) { // FNAME: zero-terminated
        while (o < b.length && b(o) != 0) o += 1
        if (o >= b.length) return None
        o += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
        while (o < b.length && b(o) != 0) o += 1
        if (o >= b.length) return None
        o += 1
      }
      if ((flg & 2) != 0) { // FHCRC: low 16 bits of the CRC32 over
        // every header byte so far (RFC 1952 §2.3.1) — VERIFIED, so
        // a corrupt header is rejected, not silently accepted
        if (o + 2 > b.length) return None
        val hc = new java.util.zip.CRC32()
        hc.update(b, memberStart, o - memberStart)
        val stored = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        if ((hc.getValue & 0xffffL) != stored) return None
        o += 2
      }
      // raw deflate stream
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(b, o, b.length - o)
      val crc = new java.util.zip.CRC32()
      var memberLen = 0L
      val buf = new Array[Byte](65536)
      var remaining = 0
      try {
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && !inf.finished()) return None // truncated stream
          crc.update(buf, 0, n)
          memberLen += n
          if (out.size().toLong + n > maxOut) return None // bomb cap
          out.write(buf, 0, n)
        }
        remaining = inf.getRemaining
      } catch {
        case _: java.util.zip.DataFormatException => return None
      } finally inf.end()
      o = b.length - remaining
      // trailer: CRC32 + ISIZE (both LE; ISIZE is length mod 2^32)
      if (o + 8 > b.length) return None
      def le32(at: Int): Long =
        ((b(at) & 0xffL)) | ((b(at + 1) & 0xffL) << 8) |
          ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
      if (le32(o) != crc.getValue || le32(o + 4) != (memberLen & 0xffffffffL))
        return None
      o += 8
      if (onMember != null)
        onMember(memberStart, o - memberStart, outStart, memberLen)
    }
    Some(out.toByteArray)
  }

  // ---- zstd (RFC 8878): the modern archive layout is `.warc.zst`
  //      (IIPC warc-zstd: ONE FRAME PER RECORD for seekability, an
  //      optional shared dictionary in a LEADING SKIPPABLE FRAME with
  //      magic 0x184D2A5D, itself optionally zstd-compressed), and
  //      servers increasingly ship `Content-Encoding: zstd`
  //      (RFC 9659). This walk owns the warc-zstd container grammar —
  //      dictionary-frame extraction and the decompression-bomb
  //      cap — and delegates the frame entropy core to zstd-jni
  //      (`com.github.luben.zstd`, already on every Spark classpath
  //      as the engine's own shuffle/parquet codec): re-deriving
  //      FSE/Huffman from spec would duplicate a vetted native core
  //      this container can't independently validate. Brotli (`br`)
  //      has NO decoder on the Spark classpath and stays a documented
  //      residual. ----

  /** zstd frame magic (RFC 8878 §3.1.1: `0xFD2FB528` LE) or a
    * skippable frame (`0x184D2A50`–`5F` LE) — either can lead a
    * `.warc.zst` file (the dictionary frame comes first when
    * present). */
  def isZstd(b: Array[Byte]): Boolean =
    b.length >= 4 && {
      val m = leU32(b, 0)
      m == 0xFD2FB528L || (m & 0xFFFFFFF0L) == 0x184D2A50L
    }

  private def leU32(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)

  /** Decompress a (possibly multi-frame) zstd buffer and concatenate
    * the frames' output, honoring the warc-zstd dictionary
    * convention: LEADING skippable frames are scanned first, and the
    * first with magic `0x184D2A5D` carries the dictionary every data
    * frame was compressed against (raw content, or itself a zstd
    * frame — both spec'd forms load). None on any malformation: bad
    * magic, a truncated or corrupt frame, data frames that need a
    * dictionary the file doesn't carry ("Dictionary mismatch" fails
    * the stream — it never emits garbage), trailing non-frame bytes,
    * or total output past `maxOut` (checked DURING decompression —
    * a zstd bomb bails at the cap, it never allocates). A buffer of
    * only skippable frames yields empty output, like an
    * all-metadata member. */
  def unzstd(b: Array[Byte], maxOut: Int = 1 << 28): Option[Array[Byte]] = {
    if (!isZstd(b)) return None
    val dict = zstdLeadingDict(b, maxOut) match {
      case Left(())  => return None
      case Right(d)  => d
    }
    // stream the WHOLE buffer: the decoder walks concatenated frames
    // and skips skippable ones natively, so offsets stay its problem
    val zis = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
      new java.io.ByteArrayInputStream(b))
    try {
      if (dict != null) zis.setDict(dict)
      val out = new java.io.ByteArrayOutputStream(math.max(64, math.min(b.length, 1 << 16)))
      drainZstd(zis, out, maxOut).map(_ => out.toByteArray)
    } catch {
      // zstd-jni surfaces corrupt/truncated/dictionary-mismatch as
      // IOException (ZstdIOException) and bad parameters as
      // ZstdException — both mean "not decodable", like a corrupt
      // gzip member
      case _: java.io.IOException                  => None
      case _: com.github.luben.zstd.ZstdException  => None
    } finally {
      try zis.close() catch { case _: java.io.IOException => () }
    }
  }

  /** scan LEADING skippable frames for the warc-zstd dictionary
    * (first frame with magic `0x184D2A5D`; content raw or itself a
    * zstd frame). Right(dict-or-null), Left on a truncated skippable
    * frame or an undecodable compressed dictionary. */
  private def zstdLeadingDict(b: Array[Byte],
                              maxOut: Int): Either[Unit, Array[Byte]] = {
    var o = 0
    while (o + 8 <= b.length && (leU32(b, o) & 0xFFFFFFF0L) == 0x184D2A50L) {
      val size = leU32(b, o + 4)
      if (size > b.length - o - 8) return Left(()) // truncated skippable frame
      if (leU32(b, o) == 0x184D2A5DL && size > 0) {
        val content = java.util.Arrays.copyOfRange(b, o + 8, o + 8 + size.toInt)
        return Right(
          if (content.length >= 4 && leU32(content, 0) == 0xFD2FB528L)
            unzstd(content, maxOut).getOrElse(return Left(()))
          else content)
      }
      o += 8 + size.toInt
    }
    Right(null)
  }

  /** read a zstd stream to `out` under the bomb cap; None on cap. */
  private def drainZstd(zis: com.github.luben.zstd.ZstdInputStreamNoFinalizer,
                        out: java.io.ByteArrayOutputStream,
                        maxOut: Int): Option[Unit] = {
    val buf = new Array[Byte](65536)
    var n = zis.read(buf)
    while (n >= 0) {
      if (out.size().toLong + n > maxOut) return None // bomb cap
      out.write(buf, 0, n)
      n = zis.read(buf)
    }
    Some(())
  }

  /** [[unzstd]] plus the per-data-frame boundary map: one
    * [[MemberRange]] per zstd DATA frame (skippable frames carry no
    * output and are not members), decompressed frame-by-frame against
    * the file's leading dictionary. The warc-zstd serving contract:
    * a reader holding the dictionary range-reads `compOff..compLen`
    * of ONE member and decompresses one record — nothing else in a
    * multi-GiB archive file is touched. */
  def unzstdMembers(b: Array[Byte], maxOut: Int = 1 << 28):
      Option[(Array[Byte], Vector[MemberRange])] = {
    if (!isZstd(b)) return None
    val dict = zstdLeadingDict(b, maxOut) match {
      case Left(())  => return None
      case Right(d)  => d
    }
    // ONE decompression context per file, dictionary loaded ONCE —
    // per-frame contexts re-digest the dict for every record and
    // turn the member walk ~8× slower than the plain parse
    val ctx = new com.github.luben.zstd.ZstdDecompressCtx()
    try {
      if (dict != null) ctx.loadDict(dict)
      val out = new java.io.ByteArrayOutputStream(math.max(64, math.min(b.length, 1 << 16)))
      val members = Vector.newBuilder[MemberRange]
      var o = 0
      while (o < b.length) {
        if (o + 4 > b.length) return None // trailing non-frame bytes
        val magic = leU32(b, o)
        if ((magic & 0xFFFFFFF0L) == 0x184D2A50L) { // skippable: walk over
          if (o + 8 > b.length) return None
          val size = leU32(b, o + 4)
          if (size > b.length - o - 8) return None
          o += 8 + size.toInt
        } else if (magic == 0xFD2FB528L) {
          val (len, contentSize) =
            try (com.github.luben.zstd.Zstd.findFrameCompressedSize(b, o),
              com.github.luben.zstd.Zstd.getFrameContentSize(b, o))
            catch { case _: com.github.luben.zstd.ZstdException => return None }
          if (len <= 0 || len > b.length - o) return None
          val outStart = out.size()
          if (contentSize > 0 && contentSize <= maxOut.toLong - outStart) {
            // header-declared size (the single-shot per-record form):
            // one native call straight into an exact-sized buffer
            val dst = new Array[Byte](contentSize.toInt)
            val n =
              try ctx.decompressByteArray(dst, 0, dst.length, b, o, len.toInt)
              catch { case _: com.github.luben.zstd.ZstdException => return None }
            if (n != contentSize) return None
            out.write(dst, 0, n)
          } else if (contentSize > 0) {
            return None // declared output past the bomb cap
          } else {
            // size-unknown frame (streaming-written): stream it
            val zis = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
              new java.io.ByteArrayInputStream(b, o, len.toInt))
            try {
              if (dict != null) zis.setDict(dict)
              drainZstd(zis, out, maxOut).getOrElse(return None)
            } catch {
              case _: java.io.IOException                  => return None
              case _: com.github.luben.zstd.ZstdException  => return None
            } finally {
              try zis.close() catch { case _: java.io.IOException => () }
            }
          }
          members += MemberRange(o, len, outStart, out.size() - outStart)
          o += len.toInt
        } else return None // not a zstd frame boundary
      }
      Some((out.toByteArray, members.result()))
    } finally ctx.close()
  }

  /** The archive's compressed-member map under EITHER layout —
    * gzip members ([[gunzipMembers]]) or zstd data frames
    * ([[unzstdMembers]]) — with the decompressed stream; None for
    * plain (uncompressed) or malformed bytes. The seam between the
    * record grammar (decompressed offsets) and the serving layer
    * (compressed ranges). */
  def memberRanges(b: Array[Byte], maxOut: Int = 1 << 28):
      Option[(Array[Byte], Vector[MemberRange])] =
    if (isGzip(b)) gunzipMembers(b, maxOut)
    else if (isZstd(b)) unzstdMembers(b, maxOut)
    else None

  /** The archive's shared decompression dictionary, read from the
    * FILE HEAD only (the warc-zstd leading skippable frame) — a
    * replay server fetches it once per archive file and reuses it
    * across every [[decodeMember]] lookup. None when the layout
    * carries no dictionary (gzip, dict-less zstd, plain) or the head
    * is malformed. `head` need only cover the dictionary frame. */
  def archiveDict(head: Array[Byte], maxOut: Int = 1 << 28): Option[Array[Byte]] =
    zstdLeadingDict(head, maxOut) match {
      case Right(d) if d != null => Some(d)
      case _                     => None
    }

  /** Decode ONE range-read compressed member (a [[MemberRange]]
    * slice) back to its record bytes — the wayback-style point
    * lookup: CDX row → ranged read of `compLen` bytes at `compOff` →
    * this. Gzip members decode standalone; zstd members decode
    * against the archive's [[archiveDict]] (null for dict-less
    * layouts). None on corrupt bytes or a wrong/missing dictionary —
    * never garbage. */
  def decodeMember(member: Array[Byte], dict: Array[Byte],
                   maxOut: Int = 1 << 28): Option[Array[Byte]] =
    if (isGzip(member)) gunzip(member, maxOut)
    else if (member.length >= 4 && leU32(member, 0) == 0xFD2FB528L) {
      if (dict == null) unzstd(member, maxOut)
      else {
        // re-wrap the dictionary in its skippable frame so the
        // member decodes exactly as it would in-file
        val hdr = new Array[Byte](8)
        def le(v: Long, at: Int): Unit = {
          hdr(at) = (v & 0xff).toByte; hdr(at + 1) = ((v >> 8) & 0xff).toByte
          hdr(at + 2) = ((v >> 16) & 0xff).toByte; hdr(at + 3) = ((v >> 24) & 0xff).toByte
        }
        le(0x184D2A5DL, 0); le(dict.length.toLong, 4)
        unzstd(hdr ++ dict ++ member, maxOut)
      }
    } else None

  // ---- HTTP payload decoding: a crawl capture stores the response
  //      body AS SENT, so the COMMON real-archive wire shapes are
  //      `Transfer-Encoding: chunked` framing and
  //      `Content-Encoding: gzip` (or `deflate`) payloads — feeding
  //      those bytes to an HTML extractor yields chunk-size hex
  //      lines or compressed garbage. Decoding order per RFC 9110
  //      §6.4 + RFC 9112 §7.1: undo the transfer coding first (it
  //      was applied last by the sender), then the content coding.
  //      Each layer DEGRADES to its input on malformation — a
  //      mislabeled or corrupt capture still flows, it never kills
  //      the task or silently vanishes. ----

  /** Reassemble a `Transfer-Encoding: chunked` body (RFC 9112 §7.1):
    * hex-size line (chunk extensions after `;` tolerated and
    * dropped), chunk data + CRLF, repeated to the 0-size last chunk;
    * an optional trailer section (header lines, then CRLF) is
    * tolerated and dropped, as is a stream-cut right after the last
    * chunk. None on malformed framing: non-hex or empty size line,
    * size > 2^31, truncated chunk data, missing chunk CRLF, bytes
    * after the trailer, or output past `maxOut`. */
  def dechunk(b: Array[Byte], off: Int, len: Int,
              maxOut: Int = 1 << 28): Option[Array[Byte]] = {
    val end = off + len
    if (off < 0 || len < 0 || end > b.length) return None
    val out = new java.io.ByteArrayOutputStream(math.min(len, 1 << 16))
    var o = off
    var last = false
    while (!last) {
      val e = lineEnd(b, o, end)
      if (e < 0) return None
      val line = new String(b, o, e - 2 - o, Ascii)
      val semi = line.indexOf(';')
      val hexRaw = (if (semi >= 0) line.substring(0, semi) else line).trim
      if (hexRaw.isEmpty || !hexRaw.forall(c => Character.digit(c, 16) >= 0)) return None
      // RFC 9112 puts no digit bound on chunk-size, and zero-padded
      // sizes ("000000ff") occur in the wild — bound the VALUE (8
      // significant digits), never the spelling
      val hexStr = { val t = hexRaw.dropWhile(_ == '0'); if (t.isEmpty) "0" else t }
      if (hexStr.length > 8) return None
      val size = java.lang.Long.parseLong(hexStr, 16)
      o = e
      if (size == 0L) last = true
      else {
        if (o + size + 2 > end) return None // truncated chunk
        if (out.size().toLong + size > maxOut) return None
        out.write(b, o, size.toInt)
        o += size.toInt
        if (b(o) != '\r' || b(o + 1) != '\n') return None
        o += 2
      }
    }
    // trailer section: zero or more field lines then an empty line;
    // exact EOF right after the last-chunk line is tolerated (the
    // same stream-cut leniency as the record separator)
    if (o < end) {
      var done = false
      while (!done) {
        val e = lineEnd(b, o, end)
        if (e < 0) return None
        if (e - o == 2) done = true
        o = e
      }
      if (o != end) return None // bytes after the trailer terminator
    }
    Some(out.toByteArray)
  }

  /** `Content-Encoding: deflate` payload (RFC 9110 §8.4.1.2 says
    * zlib-wrapped per RFC 1950, but notable real servers ship RAW
    * deflate under the same label — try the spec form first, then
    * the bare stream, like every browser). None on corrupt data or
    * output past `maxOut`. */
  def inflate(b: Array[Byte], maxOut: Int = 1 << 28): Option[Array[Byte]] =
    inflateWith(b, nowrap = false, maxOut)
      .orElse(inflateWith(b, nowrap = true, maxOut))

  private def inflateWith(b: Array[Byte], nowrap: Boolean,
                          maxOut: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(nowrap)
    inf.setInput(b)
    // capacity clamps BEFORE any multiply — b.length * 2 overflows Int
    // for GiB-scale bodies and ByteArrayOutputStream throws on negatives
    val out = new java.io.ByteArrayOutputStream(math.max(64, math.min(b.length, 1 << 16)))
    val buf = new Array[Byte](65536)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return None // truncated
        if (out.size().toLong + n > maxOut) return None // bomb cap
        out.write(buf, 0, n)
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** one coding-list header value → its tokens in header order (the
    * order the sender APPLIED them, RFC 9110 §6.4); empty members and
    * `identity` no-ops drop. A transfer-coding may carry parameters
    * (`chunked;ext=1` — RFC 9112 §7's transfer-parameter grammar), so
    * each member strips at its first `;` before matching: a
    * parameterized `chunked` must still dechunk, not flow raw with a
    * residual. */
  private def codingTokens(v: String): Array[String] =
    v.split(",").iterator.map(_.takeWhile(_ != ';').trim)
      .filter(t => t.nonEmpty && t != "identity").toArray

  /** undo ONE coding layer, or None when the label doesn't match the
    * bytes / the coding isn't decodable here (br, compress). */
  private def undoCoding(tok: String, b: Array[Byte], maxOut: Int): Option[Array[Byte]] =
    tok match {
      case "chunked" => dechunk(b, 0, b.length, maxOut)
      case "gzip" | "x-gzip" => gunzip(b, maxOut)
      case "deflate" => inflate(b, maxOut)
      case "zstd" => unzstd(b, maxOut)
      case _ => None
    }

  /** A response record's body with its HTTP codings undone, plus the
    * RESIDUAL coding list that was NOT undone ("" when the payload is
    * fully decoded).
    *
    * The full coding stack is content codings then transfer codings
    * (the sender applies CE first, TE last — RFC 9110 §6.4 +
    * RFC 9112 §7), each list in header order, so codings are undone
    * RIGHT-TO-LEFT across the concatenation: `TE: gzip, chunked`
    * dechunks then gunzips; `CE: gzip` + `TE: chunked` dechunks then
    * gunzips; stacked lists compose. Undoing stops at the first layer
    * that fails or isn't decodable here (undecodable-coded bytes are
    * opaque — trying inner layers on them is meaningless); everything
    * still wrapped is returned innermost-first as the residual, so a
    * mislabeled capture or a brotli body degrades WITH THE
    * EVIDENCE ATTACHED — downstream curation filters on the column
    * instead of silently mojibaking (`identity` never appears: it is
    * a no-op, not a wrapper). */
  def decodeHttpPayload(raw: Array[Byte], rec: WarcRec,
                        maxOut: Int = 1 << 28): (Array[Byte], String) = {
    var body = java.util.Arrays.copyOfRange(raw, rec.bodyOffset.toInt,
      (rec.bodyOffset + rec.bodyLength).toInt)
    val stack = codingTokens(rec.contentEncoding) ++ codingTokens(rec.transferEncoding)
    var i = stack.length - 1
    var failed = false
    while (i >= 0 && !failed) {
      undoCoding(stack(i), body, maxOut) match {
        case Some(nb) => body = nb; i -= 1
        case None => failed = true
      }
    }
    (body, if (i >= 0) stack.take(i + 1).mkString(", ") else "")
  }

  /** [[decodeHttpPayload]]'s bytes alone — for callers that only
    * slice (the residual-aware path is [[Multimodal.warcResponses]]'
    * `coding_residual` column). */
  def decodeHttpBody(raw: Array[Byte], rec: WarcRec,
                     maxOut: Int = 1 << 28): Array[Byte] =
    decodeHttpPayload(raw, rec, maxOut)._1

  /** [[warcRecords]] over plain, gzipped (`.warc.gz`) or
    * zstd-compressed (`.warc.zst`, incl. the dictionary-frame form)
    * bytes — the corpus-facing entry. Returns the decompressed buffer
    * alongside the records (offsets refer to it) so callers can slice
    * bodies. */
  def warcRecordsAny(b: Array[Byte], maxRecords: Int = 1 << 20,
                     maxOut: Int = 1 << 28): Option[(Array[Byte], Vector[WarcRec])] = {
    val raw =
      if (isGzip(b)) gunzip(b, maxOut)
      else if (isZstd(b)) unzstd(b, maxOut)
      else Some(b)
    raw.flatMap(r => warcRecords(r, maxRecords).map(r -> _))
  }
}
