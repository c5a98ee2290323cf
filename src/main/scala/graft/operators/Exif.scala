package graft.operators

/** From-spec EXIF metadata parsing (TIFF 6.0 IFD walk, JPEG APP1
  * carrier) — the media-PII and provenance signal of multimodal
  * curation: camera make/model and capture time drive
  * device-/session-level dedup and temporal splits, orientation
  * gates decode-side rotation, and GPS-IFD PRESENCE is the flag a
  * privacy pass keys on (location data in training images is PII the
  * same way addresses in text are).
  *
  * Accepts either a JPEG (marker scan to the `Exif\0\0` APP1
  * payload, stopping at SOS/EOI) or bare TIFF bytes, both byte
  * orders. IFD0 tags read: Make (0x010F), Model (0x0110),
  * Orientation (0x0112), DateTime (0x0132), GPS IFD pointer
  * (0x8825). Inline (count ≤ 4) and offset ASCII values both
  * handled; entry count and string lengths capped; any structural
  * violation returns None, never throws.
  */
object Exif {

  /** Parsed metadata: absent strings are "", absent orientation 0,
    * `hasGps` true only for an in-bounds GPS IFD pointer. */
  final case class ExifMeta(make: String, model: String, orientation: Int,
                            dateTime: String, hasGps: Boolean)

  private val MaxEntries = 512
  private val MaxStr = 1024

  def exifMeta(b: Array[Byte]): Option[ExifMeta] = {
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      jpegExifBase(b).flatMap(base => tiffWalk(b, base))
    else if (isTiffMagic(b, 0)) tiffWalk(b, 0)
    else None
  }

  private def isTiffMagic(b: Array[Byte], o: Int): Boolean =
    b.length >= o + 8 &&
      (((b(o) == 'I' && b(o + 1) == 'I') && b(o + 2) == 42 && b(o + 3) == 0) ||
        ((b(o) == 'M' && b(o + 1) == 'M') && b(o + 2) == 0 && b(o + 3) == 42))

  /** offset of the TIFF header inside a JPEG's Exif APP1, or None. */
  private def jpegExifBase(b: Array[Byte]): Option[Int] = {
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS: no EXIF
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
      else {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > b.length) return None
        if (marker == 0xe1 && len >= 8 &&
          b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' && b(i + 7) == 'f' &&
          b(i + 8) == 0 && b(i + 9) == 0)
          return Some(i + 10)
        i += 2 + len
      }
    }
    None
  }

  private def tiffWalk(b: Array[Byte], base: Int): Option[ExifMeta] = {
    if (!isTiffMagic(b, base)) return None
    val le = b(base) == 'I'
    def u16(o: Int): Int =
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    val ifd0 = u32(base + 4)
    if (ifd0 < 8 || base + ifd0 + 2 > b.length) return None
    val entriesAt = base + ifd0.toInt
    val n = u16(entriesAt)
    if (n > MaxEntries || entriesAt + 2 + n * 12 + 4 > b.length) return None
    var make = ""; var model = ""; var dateTime = ""
    var orientation = 0; var hasGps = false
    def ascii(count: Long, valueAt: Int): Option[String] = {
      if (count < 1 || count > MaxStr) return None
      val at =
        if (count <= 4) valueAt // inline in the value field
        else {
          val off = u32(valueAt)
          if (base + off + count > b.length) return None
          base + off.toInt
        }
      if (at + count > b.length) return None
      var end = at + count.toInt
      while (end > at && b(end - 1) == 0) end -= 1 // trim NUL padding
      Some(new String(b, at, end - at, java.nio.charset.StandardCharsets.US_ASCII))
    }
    var i = 0
    while (i < n) {
      val e = entriesAt + 2 + i * 12
      val tag = u16(e)
      val typ = u16(e + 2)
      val count = u32(e + 4)
      val valueAt = e + 8
      tag match {
        case 0x010f if typ == 2 => make = ascii(count, valueAt).getOrElse(return None)
        case 0x0110 if typ == 2 => model = ascii(count, valueAt).getOrElse(return None)
        case 0x0132 if typ == 2 => dateTime = ascii(count, valueAt).getOrElse(return None)
        case 0x0112 if typ == 3 && count == 1 => orientation = u16(valueAt)
        case 0x8825 if typ == 4 && count == 1 =>
          val off = u32(valueAt)
          hasGps = off >= 8 && base + off + 2 <= b.length
        case _ => () // unknown tags are legal and ignored
      }
      i += 1
    }
    Some(ExifMeta(make, model, orientation, dateTime, hasGps))
  }
}
