package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.ErrorRouting

/** Parses the reference's canonical fixture lines (FIXTURES.md §1,
  * `inttest/integration_test.go:247`, `node/node_test.go:86`).
  */
class SyslogSpec extends SparkSpec {

  private def parseOne(line: String) = {
    import spark.implicits._
    Seq(line).toDF("raw").select(Syslog.parse(col("raw")).as("m")).select("m.*").collect().head
  }

  test("canonical CEE line without pid") {
    val r = parseOne("""<191>2006-01-02T15:04:05.999999-07:00 host.example.org test: @cee:{"a":"b"}""")
    assert(r.getAs[Int]("pri") == 191)
    assert(r.getAs[Int]("facility") == 23)
    assert(r.getAs[Int]("severity") == 7)
    assert(r.getAs[String]("host") == "host.example.org")
    assert(r.getAs[String]("program") == "test")
    assert(r.getAs[String]("pid") == "")
    assert(r.getAs[Boolean]("cee"))
    assert(r.getAs[String]("content") == """{"a":"b"}""")
  }

  test("line with pid") {
    val r = parseOne("""<191>2021-01-02T15:04:05.999999-07:00 host.example.org test[42]: @cee:{"msg":"log 42"}""")
    assert(r.getAs[String]("pid") == "42")
    assert(r.getAs[String]("program") == "test")
    assert(r.getAs[Boolean]("cee"))
  }

  test("non-cee content preserved verbatim") {
    val r = parseOne("<13>2024-01-01T00:00:00Z myhost sshd[99]: Accepted publickey for root")
    assert(!r.getAs[Boolean]("cee"))
    assert(r.getAs[String]("content") == "Accepted publickey for root")
    assert(r.getAs[Int]("facility") == 1)
    assert(r.getAs[Int]("severity") == 5)
  }

  test("stage dead-letters unparseable lines like the reference node") {
    import spark.implicits._
    val env = Seq(
      """<191>2024-01-01T00:00:00Z h p[1]: ok""",
      "not a syslog line").toDF("payload")
      .select(col("payload").cast("binary").as("payload"),
        current_timestamp().as("created"), lit(false).as("recovery"))
    val split = ErrorRouting(env, Syslog.stage)
    assert(split.output.count() == 1)
    val dead = split.deadLetters.get.collect()
    assert(dead.length == 1)
    val err = split.deadLetters.get.select(col("payload.error.code"), col("payload.error.message")).collect().head
    assert(err.getString(0) == "ERR_PARSE")
    assert(err.getString(1) == "failed to parse syslog msg")
  }
}
