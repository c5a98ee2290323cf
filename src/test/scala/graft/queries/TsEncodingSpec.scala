package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.SparkSpec
import graft.functions.EpochTime

/** Pins the `events.ts` encoding contract: the driver has regenerated
  * testdata with three different parquet encodings so far (INT64 nanos in
  * rounds 1-6, TIMESTAMP(MICROS, isAdjustedToUTC=false) = Spark
  * TIMESTAMP_NTZ in round 7, and plain TIMESTAMP(MICROS, UTC) is the
  * obvious third) — round 7 ended red because the NTZ flip only surfaced
  * in the driver's post-round sweep. [[Tables]] must read all three to
  * the SAME TimestampType instants, so the next silent regeneration fails
  * here instead.
  */
class TsEncodingSpec extends SparkSpec {

  private def writeFixture(ts: org.apache.spark.sql.Column): String = {
    val dir = Files.createTempDirectory("graft-ts-enc").toString
    spark.range(3).select(
        col("id").as("event_id"),
        ts.as("ts"),
        lit(1L).as("user_id"))
      // single parquet FILE named events.parquet, like the driver's layout
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp")
    val part = new java.io.File(s"$dir/tmp").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(s"$dir/events.parquet").toPath)
    dir
  }

  test("Tables reads nanos-long / TIMESTAMP_NTZ / TIMESTAMP ts to identical epoch seconds") {
    // 2024-01-02 03:04:05.678901 UTC + id seconds
    val baseMicros = 1704164645678901L
    val micros = expr(s"${baseMicros}L + id * 1000000L")
    val utcDir = writeFixture(timestamp_micros(micros))
    val ntzDir = writeFixture(timestamp_micros(micros).cast(TimestampNTZType))
    val nanosDir = writeFixture((micros * 1000L).cast("long"))

    // the raw reads really are three distinct Spark types (else this spec
    // silently stops covering anything when an encoding changes)
    assert(spark.read.parquet(s"$utcDir/events.parquet").schema("ts").dataType == TimestampType)
    assert(spark.read.parquet(s"$ntzDir/events.parquet").schema("ts").dataType == TimestampNTZType)
    assert(spark.read.parquet(s"$nanosDir/events.parquet").schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)

    def readBack(dir: String): Seq[(Long, Long, Long)] = {
      val t = Tables(spark, dir, "events")
      assert(t.schema("ts").dataType == TimestampType, s"$dir not normalized")
      t.select(col("event_id"), EpochTime.epochSeconds(col("ts")),
          unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    }
    val utc = readBack(utcDir)
    assert(utc == readBack(ntzDir))
    assert(utc == readBack(nanosDir))
    assert(utc.head._3 == baseMicros) // instant preserved, not just consistent
  }

  test("EpochTime accepts TIMESTAMP, TIMESTAMP_NTZ and epoch-seconds long columns") {
    val df = spark.sql(
      """SELECT TIMESTAMP'2024-01-02 03:04:05.9' AS t,
        |       TIMESTAMP_NTZ'2024-01-02 03:04:05.9' AS tn,
        |       1704164645L AS sec""".stripMargin)
    val r = df.select(
        EpochTime.epochSeconds(col("t")), EpochTime.epochSeconds(col("tn")),
        EpochTime.epochSeconds(col("sec")),
        EpochTime.epochMillis(col("t")), EpochTime.epochMillis(col("tn")))
      .collect().head
    assert((0 to 2).map(r.getLong).forall(_ == 1704164645L))
    assert(r.getLong(3) == 1704164645900L && r.getLong(4) == 1704164645900L)
  }
}
