package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.pipeline.{FailSpec, Stage}

/** RFC3164+CEE syslog parsing as pure column expressions (whole-stage
  * codegen; no UDF). Behavior of the reference's `syslogparser` node
  * (`node/syslogparser/syslogparser.go:25-40`, captainslog parse):
  * unparseable lines are routed to the error handler, parsed lines
  * become the struct payload of SURVEY §1.5:
  *
  *   struct<pri, facility, severity, time, host, program, pid, cee, content>
  *
  * Grammar handled: `<PRI>TIMESTAMP HOST TAG[: ]CONTENT` with optional
  * `[pid]` in the tag and optional `@cee:` JSON cookie in the content.
  */
object Syslog {

  private val Pattern =
    "^<(\\d{1,3})>(\\S+) (\\S+) ([^:\\[\\s]+)(?:\\[(\\d+)\\])?: (.*)$"

  def isSyslog(raw: Column): Column = raw.rlike(Pattern)

  /** Parse a raw syslog string into the typed struct. Fields are null
    * when the line does not match (callers split those off via the
    * stage's failWhen).
    */
  def parse(raw: Column): Column = {
    val pri = regexp_extract(raw, Pattern, 1).cast("int")
    val time = to_timestamp(regexp_extract(raw, Pattern, 2))
    val host = regexp_extract(raw, Pattern, 3)
    val program = regexp_extract(raw, Pattern, 4)
    val pid = regexp_extract(raw, Pattern, 5)
    val rawContent = regexp_extract(raw, Pattern, 6)
    val cee = rawContent.startsWith("@cee:")
    struct(
      pri.as("pri"),
      (pri / 8).cast("int").as("facility"),
      pmod(pri, lit(8)).cast("int").as("severity"),
      time.as("time"),
      host.as("host"),
      program.as("program"),
      pid.as("pid"),
      cee.as("cee"),
      when(cee, substring(rawContent, 6, Int.MaxValue)).otherwise(rawContent).as("content"))
  }

  /** The syslogparser node: bytes payload → syslog struct payload,
    * non-matching lines dead-lettered.
    */
  def stage: Stage = {
    val raw = col("payload").cast("string")
    Stage(
      failWhen = Some(FailSpec(
        cond = !isSyslog(raw),
        code = lit("ERR_PARSE"),
        msg = lit("failed to parse syslog msg"))),
      project = df => {
        val r = col("payload").cast("string")
        df.select(parse(r).as("payload"), col("created"), col("recovery"))
      })
  }
}
