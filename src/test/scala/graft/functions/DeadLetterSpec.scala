package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dead-letter JSON must be parseable and carry the reference's field
  * shape (`error.go:29-47`), including escaping.
  */
class DeadLetterSpec extends SparkSpec {

  private def render(event: String, code: String, msg: String): String = {
    import spark.implicits._
    Seq(event).toDF("event")
      .select(DeadLetter.json(
        to_timestamp(lit("2024-01-02 03:04:05")),
        col("event"), lit(code), lit(msg)).as("j"))
      .collect().head.getString(0)
  }

  test("plain payload") {
    assert(render("hello", "ERR_UNKNOWN", "boom") ==
      """{"timestamp":"2024-01-02T03:04:05Z","event":"hello","error":{"code":"ERR_UNKNOWN","message":"boom"}}""")
  }

  test("quotes and backslashes escaped; output is valid JSON") {
    val j = render("""say "hi" c:\tmp""", "E", "m")
    assert(j.contains("""say \"hi\" c:\\tmp"""))
    // machine-checkable: Spark's from_json can read it back
    import spark.implicits._
    val parsed = Seq(j).toDF("j")
      .select(from_json(col("j"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "timestamp STRING, event STRING, error STRUCT<code: STRING, message: STRING>")).as("p"))
      .select("p.event", "p.error.code").collect().head
    assert(parsed.getString(0) == """say "hi" c:\tmp""")
    assert(parsed.getString(1) == "E")
  }
}
