package graft.functions

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Charset detection: the strict UTF-8 scanner kernel vs the JDK's
  * own strict decoder (validity must agree bit-for-bit on random
  * buffers — the JDK is an independent implementation of the same
  * RFC 3629 table), exact invalid counts on every reject class, and
  * the BOM-first classification order.
  */
class CharsetSpec extends SparkSpec {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** JDK strict validity: decodes without error under REPORT. */
  private def jdkValid(b: Array[Byte]): Boolean = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(b)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
  }

  test("scanner validity agrees with the JDK strict decoder on random buffers") {
    val rnd = new scala.util.Random(0xC0DEL)
    for (i <- 0 until 20000) {
      val b = new Array[Byte](rnd.nextInt(24))
      rnd.nextBytes(b)
      val ours = Kernels.utf8InvalidEval(b) == 0
      assert(ours == jdkValid(b),
        s"#$i bytes ${b.map("%02X".format(_)).mkString} ours=$ours jdk=${jdkValid(b)}")
    }
    // and on valid UTF-8 encodings of random strings (multibyte-heavy)
    for (i <- 0 until 2000) {
      val s = (0 until rnd.nextInt(12)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => rnd.nextPrintableChar().toString
          case 1 => "é"
          case 2 => "€"
          case _ => new String(Character.toChars(0x10000 + rnd.nextInt(0x10000)))
        }
      }.mkString
      val b = s.getBytes(StandardCharsets.UTF_8)
      assert(Kernels.utf8InvalidEval(b) == 0, s"#$i valid encoding flagged: $s")
    }
  }

  test("invalid counts are exact per reject class (one per sequence start, resync next byte)") {
    assert(Kernels.utf8InvalidEval(hex("68656C6C6F")) == 0)   // ascii
    assert(Kernels.utf8InvalidEval(hex("636166E9")) == 1)     // latin-1 tail
    assert(Kernels.utf8InvalidEval(hex("C080")) == 2)         // overlong NUL
    assert(Kernels.utf8InvalidEval(hex("EDA080")) == 3)       // surrogate
    assert(Kernels.utf8InvalidEval(hex("F09F98")) == 3)       // truncated 4-byte
    assert(Kernels.utf8InvalidEval(hex("F4908080")) == 4)     // > U+10FFFF
    assert(Kernels.utf8InvalidEval(hex("80")) == 1)           // lone continuation
    assert(Kernels.utf8InvalidEval(hex("F5")) == 1)           // out-of-range lead
    // boundary ACCEPTS: E0 A0 80 / ED 9F BF / F0 90 80 80 / F4 8F BF BF
    for (h <- Seq("E0A080", "ED9FBF", "F0908080", "F48FBFBF"))
      assert(Kernels.utf8InvalidEval(hex(h)) == 0, h)
    // boundary REJECTS one step over: E0 9F (overlong), F0 8F (overlong)
    assert(Kernels.utf8InvalidEval(hex("E09FBF")) == 3)
    assert(Kernels.utf8InvalidEval(hex("F08FBFBF")) == 4)
    assert(Kernels.highBytesEval(hex("00407F80FF")) == 2)
    assert(Kernels.nulBytesEval(hex("00407F8000")) == 2)
    assert(Kernels.nulBytesEval(hex("FFD8FFE0")) == 0)
  }

  test("detectEncoding: BOMs outrank content, UTF-32LE outranks its UTF-16LE prefix") {
    val rows = Seq(
      "68656C6C6F" -> "ascii",
      "63616665CC81" -> "utf-8",
      "EFBBBF6869" -> "utf-8-bom",
      "FFFE6800" -> "utf-16le",
      "FEFF0068" -> "utf-16be",
      "FFFE00000000" -> "utf-32le",
      "0000FEFF00000068" -> "utf-32be",
      "636166E9" -> "latin-1",              // rejected, no NUL -> terminal fallback
      "A1A2A3" -> "latin-1",                // all-high rejects, still no NUL
      "FFD8FFE000104A464946" -> "binary",   // JPEG SOI+APP0: rejected AND has NULs
      "680069" -> "binary",                 // "h\0i": scanner-clean, NUL wins
      "E282AC0000" -> "binary")             // NUL-padded valid multibyte blob
    import spark.implicits._
    val got = rows.map(_._1).toDF("hx")
      .select(col("hx"), TextFunctions.detectEncoding(unhex(col("hx"))).as("enc"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    rows.foreach { case (hx, want) => assert(got(hx) == want, s"$hx -> ${got(hx)} want $want") }
    // the kernels stay inside whole-stage codegen (no SerDe boundary)
    // — over a range scan; a literal local relation constant-folds to
    // LocalTableScan before codegen gets a say
    val plan = spark.range(4)
      .select(TextFunctions.detectEncoding(encode(col("id").cast("string"), "UTF-8")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // the WholeStageCodegen marker
  }

  test("detectCharsetEval (JVM body-routing mirror) agrees with the Column ladder label-for-label") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xBEEFL)
    val bufs = (0 until 400).map { _ =>
      val b = new Array[Byte](rnd.nextInt(16))
      rnd.nextBytes(b)
      // bias some buffers toward BOM prefixes so every ladder rung fires
      if (rnd.nextInt(4) == 0 && b.length >= 4) {
        val bom = Seq(hex("EFBBBF"), hex("FFFE"), hex("FEFF"),
          hex("FFFE0000"), hex("0000FEFF"))(rnd.nextInt(5))
        System.arraycopy(bom, 0, b, 0, math.min(bom.length, b.length))
      }
      b
    } ++ Seq("68656C6C6F", "63616665CC81", "EFBBBF6869", "FFFE6800", "FEFF0068",
      "FFFE00000000", "0000FEFF00000068", "636166E9", "680069").map(hex)
    val viaColumn = bufs.map(b => b.map("%02X".format(_)).mkString).toDF("hx")
      .select(col("hx"), TextFunctions.detectEncoding(unhex(col("hx"))).as("enc"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    bufs.foreach { b =>
      val hx = b.map("%02X".format(_)).mkString
      assert(Kernels.detectCharsetEval(b) == viaColumn(hx),
        s"$hx: eval=${Kernels.detectCharsetEval(b)} column=${viaColumn(hx)}")
    }
  }

  test("decodeTextEval: BOMs consumed, latin-1 fallback decodes, binary yields no text") {
    assert(Kernels.decodeTextEval("plain ascii".getBytes("US-ASCII")).contains("plain ascii"))
    assert(Kernels.decodeTextEval("café".getBytes(StandardCharsets.UTF_8)).contains("café"))
    assert(Kernels.decodeTextEval(hex("EFBBBF") ++ "bom text".getBytes("US-ASCII"))
      .contains("bom text"))
    assert(Kernels.decodeTextEval(("\uFEFF" + "wide").getBytes(StandardCharsets.UTF_16LE))
      .contains("wide"))
    assert(Kernels.decodeTextEval(("\uFEFF" + "wide").getBytes(StandardCharsets.UTF_16BE))
      .contains("wide"))
    assert(Kernels.decodeTextEval("café".getBytes(StandardCharsets.ISO_8859_1))
      .contains("café")) // 0xE9 → latin-1 fallback
    assert(Kernels.decodeTextEval(hex("FFD8FFE000104A464946")).isEmpty) // JPEG → binary
    assert(Kernels.decodeTextEval(hex("680069")).isEmpty) // NUL wins over clean scan
  }
}
