package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the EXIF walk byte-for-byte: little- and big-endian TIFF
  * headers, inline vs offset ASCII values, the JPEG APP1 carrier
  * scan (skipping other segments), GPS pointer bounds, NUL trimming,
  * and the reject paths.
  */
class ExifSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** little-endian TIFF block: Make "Cam1" (inline NUL-less 4B),
    * Model "ModelX" @offset, Orientation 6, DateTime @offset, GPS IFD
    * pointer @0x62 (in bounds). IFD0 at 8, 5 entries. */
  private val tiffLe = hex(
    "49492A00" + "08000000" + // II, IFD0 @ 8
      "0500" + // 5 entries
      "0F010200" + "04000000" + "43616D31" + // Make, count 4 → inline "Cam1"
      "10010200" + "07000000" + "4A000000" + // Model @ 0x4A, 7 bytes
      "12010300" + "01000000" + "06000000" + // Orientation = 6
      "32010200" + "14000000" + "51000000" + // DateTime @ 0x51, 20 bytes
      "25880400" + "01000000" + "65000000" + // GPS IFD @ 0x65
      "00000000" + // next IFD
      "4D6F64656C5800" + // 0x4A: "ModelX\0"
      "323032363A30383A31362030333A30303A303000" + // 0x51: 20 bytes
      "0100" + "00000100" + "04000000" + "02030000" + "00000000") // 0x65: GPS IFD

  test("little-endian TIFF: inline + offset ASCII, orientation, GPS bounds") {
    val m = Exif.exifMeta(tiffLe).get
    assert(m == Exif.ExifMeta("Cam1", "ModelX", 6, "2026:08:16 03:00:00", hasGps = true))
  }

  test("JPEG carrier: APP1 Exif payload found after other segments; SOS stops the scan") {
    val app0 = "FFE0" + "0010" + "4A46494600" + "00" * 9 // JFIF APP0, len 16
    val tiffHex = tiffLe.map("%02X".format(_)).mkString
    val app1len = "%04X".format(2 + 6 + tiffLe.length)
    val jpeg = hex("FFD8" + app0 + "FFE1" + app1len + "457869660000" + tiffHex + "FFD9")
    assert(Exif.exifMeta(jpeg).get.model == "ModelX")
    // no APP1 before SOS → None
    assert(Exif.exifMeta(hex("FFD8" + app0 + "FFDA" + "0004" + "0000")).isEmpty)
  }

  test("big-endian TIFF parses with swapped readers") {
    val be = hex(
      "4D4D002A" + "00000008" +
        "0002" +
        "01120003" + "00000001" + "00030000" + // Orientation = 3 (BE short)
        "88250004" + "00000001" + "00000026" + // GPS @ 0x26
        "00000000" +
        "0000") // 0x26: empty GPS IFD (count 0)
    val m = Exif.exifMeta(be).get
    assert(m.orientation == 3 && m.hasGps && m.make == "" && m.dateTime == "")
  }

  test("rejects: bad magic, OOB IFD, OOB string offset, oversized count; GPS OOB = no flag") {
    assert(Exif.exifMeta(Array[Byte]()).isEmpty)
    assert(Exif.exifMeta("not an image".getBytes).isEmpty)
    assert(Exif.exifMeta(hex("49492A00" + "FF000000")).isEmpty) // IFD0 past EOF
    // Make offset points past EOF → None
    assert(Exif.exifMeta(hex("49492A00" + "08000000" + "0100" +
      "0F010200" + "08000000" + "FF000000" + "00000000")).isEmpty)
    // entry count beyond cap → None
    assert(Exif.exifMeta(hex("49492A00" + "08000000" + "FFFF")).isEmpty)
    // GPS pointer past EOF → parses, hasGps false
    val m = Exif.exifMeta(hex("49492A00" + "08000000" + "0100" +
      "25880400" + "01000000" + "FF000000" + "00000000")).get
    assert(!m.hasGps)
  }
}
