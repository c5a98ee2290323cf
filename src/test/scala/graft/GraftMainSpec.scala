package graft

import java.nio.file.Files

/** Drives the CLI entrypoint end to end from a config file on disk —
  * the `examples/main.go` usage shape: YAML in, parquet terminal
  * outputs + a metrics summary out, config errors surfaced verbatim.
  */
class GraftMainSpec extends SparkSpec {

  private def write(dir: java.nio.file.Path, yaml: String): String = {
    val p = dir.resolve("config.yaml")
    Files.writeString(p, yaml)
    p.toString
  }

  test("batch run from a YAML file writes terminal outputs and reports metrics") {
    val dir = Files.createTempDirectory("graft-main")
    val out = dir.resolve("out").toString
    val cfg = write(dir,
      s"""application: cli-test
         |internaldata:
         |  transport: file
         |  params:
         |    path: $dir/control.jsonl
         |source:
         |  name: stringsource
         |  params:
         |    path: /root/testdata/sf0.001/documents.parquet
         |    payloadexpr: text
         |nodes:
         |  - name: filternode
         |    params:
         |      prefix: zzz-no-match
         |    children:
         |      - name: resultsnode
         |""".stripMargin)
    val res = GraftMain.run(spark, cfg, out)
    val summary = res.fold(e => fail(s"run failed: $e"), identity)
    assert(summary.contains(""""application":"cli-test""""))
    assert(summary.contains(""""filternode.received":500"""))
    val written = spark.read.parquet(s"$out/resultsnode")
    assert(written.count() == 500)
    assert(written.columns.toSet == Set("payload", "created", "recovery"))
  }

  test("config errors surface verbatim instead of running") {
    val dir = Files.createTempDirectory("graft-main")
    val cfg = write(dir,
      """application: bad
        |source:
        |  name: stringsource
        |  params: {path: unused}
        |nodes:
        |  - name: no-such-node-type
        |""".stripMargin)
    val res = GraftMain.run(spark, cfg, dir.resolve("out").toString)
    assert(res.isLeft, "invalid node type must not run")
  }

  test("--stream demands a kafkaconsumer source") {
    val dir = Files.createTempDirectory("graft-main")
    val cfg = write(dir,
      """application: streambad
        |source:
        |  name: stringsource
        |  params: {path: unused}
        |nodes:
        |  - name: resultsnode
        |""".stripMargin)
    val res = GraftMain.run(spark, cfg, dir.resolve("out").toString, streamMode = true)
    assert(res.swap.exists(_.contains("kafkaconsumer")))
  }

  test("stream sink keys mirror Pipeline.Built.leaves for a tree with error handlers") {
    val reg = graft.pipeline.Registry.builtins()
    reg.registerSourceType("gmsrc", new graft.pipeline.SourceFactory {
      val produces = "string"
      def read(spark: org.apache.spark.sql.SparkSession, params: Map[String, String]) = {
        import org.apache.spark.sql.functions._
        spark.range(3).select(col("id").cast("string").as("payload"),
          current_timestamp().as("created"), lit(false).as("recovery"))
      }
    })
    val cfg = graft.config.AppConfig.parse(
      """application: keys
        |source:
        |  name: gmsrc
        |nodes:
        |  - name: filternode
        |    children:
        |      - name: errornode
        |        error_handler:
        |          name: errorhandlernode
        |        children:
        |          - name: resultsnode
        |      - name: resultsnode
        |        id: secondleaf
        |""".stripMargin, reg).fold(e => fail(e), identity)
    val built = graft.pipeline.Pipeline.build(spark, cfg, reg)
    assert(GraftMain.leafIds(cfg.nodes).toSet == built.leaves.map(_._1).toSet)
  }

  test("missing config file is a readable error, not a crash") {
    val res = GraftMain.run(spark, "/nonexistent/config.yaml", "/tmp/unused-out")
    assert(res.swap.exists(_.contains("failed to read config file")))
  }
}
