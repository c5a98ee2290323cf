package graft.config

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Registry

/** Config validation matrix mirroring the reference's negative fixtures
  * (`config/config_test.go`, `config/testdata/testconfig_*.yaml`) and
  * its defaulting rules (`config/config.go:213-237`).
  */
class ConfigSpec extends AnyFunSuite {

  private val reg = Registry.builtins()

  private def tree(rootName: String = "filternode",
                   childName: String = "errornode",
                   childId: String = "",
                   errorHandler: String = "",
                   ehExtra: String = ""): String =
    s"""application: TestApp
       |source:
       |  name: stringsource
       |  params:
       |    path: /tmp/x.parquet
       |nodes:
       |  - name: $rootName
       |    workers: 1
       |    buffersize: 100
       |    children:
       |      - name: $childName
       |${if (childId.nonEmpty) s"        id: $childId\n" else ""}${
      if (errorHandler.nonEmpty)
        s"        error_handler:\n          name: $errorHandler\n$ehExtra"
      else ""}""".stripMargin

  test("valid config parses with defaults applied") {
    val cfg = AppConfig.parse(tree(), reg).toOption.get
    assert(cfg.applicationName == "TestApp")
    val root = cfg.nodes.head
    assert(root.id == "filternode") // id defaults to name
    assert(root.children.head.workers == 1) // workers default
    assert(root.children.head.bufferSize == 1) // buffersize default
    assert(cfg.shutdownTimeout == 10) // shutdowntimeout default
  }

  test("duplicate node ids rejected") {
    val yaml = tree(childId = "filternode")
    val err = AppConfig.parse(yaml, reg).swap.toOption.get
    assert(err == "multiple nodes exist with the same id filternode; set an explicit 'id' in your config to make them unique")
  }

  test("unknown source type rejected") {
    val yaml = tree().replace("stringsource", "nosuchsource")
    assert(AppConfig.parse(yaml, reg).swap.toOption.get == "source type nosuchsource not registered")
  }

  test("unknown root node type rejected") {
    val yaml = tree(rootName = "nosuchnode")
    assert(AppConfig.parse(yaml, reg).swap.toOption.get == "node type nosuchnode not registered")
  }

  test("unknown child node type rejected") {
    val yaml = tree(childName = "nosuchnode")
    assert(AppConfig.parse(yaml, reg).swap.toOption.get == "node type nosuchnode not registered")
  }

  test("source to root type mismatch rejected") {
    // parquetsource produces []uint8 but filternode consumes string
    val yaml = tree().replace("stringsource", "parquetsource")
    val err = AppConfig.parse(yaml, reg).swap.toOption.get
    assert(err == "source type parquetsource produces []uint8, but root node filternode consumes incompatible type string")
  }

  test("node to child type mismatch rejected") {
    // filternode produces string but syslogparser consumes []uint8
    val yaml = tree(childName = "syslogparser")
    val err = AppConfig.parse(yaml, reg).swap.toOption.get
    assert(err == "node type filternode produces string, but child syslogparser consumes incompatible type []uint8")
  }

  test("error handler must consume EventError") {
    val yaml = tree(errorHandler = "filternode")
    val err = AppConfig.parse(yaml, reg).swap.toOption.get
    assert(err == "error_handler node type filternode must consume EventError, actually consumes string")
  }

  test("error handler type must be registered") {
    val yaml = tree(errorHandler = "nosuchhandler")
    assert(AppConfig.parse(yaml, reg).swap.toOption.get == "error_handler node type nosuchhandler not registered")
  }

  test("error handler may not have children") {
    val yaml = tree(errorHandler = "errorhandlernode",
      ehExtra = "          children:\n            - name: resultsnode\n")
    val err = AppConfig.parse(yaml, reg).swap.toOption.get
    assert(err == "error_handler nodes may not have children for node errorhandlernode")
  }

  test("error handler may not have its own error handler") {
    val yaml = tree(errorHandler = "errorhandlernode",
      ehExtra = "          error_handler:\n            name: errorhandlernode\n")
    val err = AppConfig.parse(yaml, reg).swap.toOption.get
    assert(err == "error_handler nodes may not have an error_handler of their own for node errorhandlernode")
  }

  test("invalid internaldata transport rejected") {
    val yaml = "internaldata:\n  transport: rabbitmq\n" + tree()
    assert(AppConfig.parse(yaml, reg).swap.toOption.get == "internal data transport rabbitmq not supported")
  }

  test("invalid yaml rejected") {
    assert(AppConfig.parse("nodes: [unclosed", reg).swap.toOption.get.startsWith("config file parse error"))
  }

  test("env var expansion") {
    // PATH is always set; unset vars expand to empty like os.ExpandEnv
    val s = AppConfig.expandEnv("a ${PATH} b ${GRAFT_UNSET_VAR_XYZ} c")
    assert(s.contains(sys.env("PATH")))
    assert(s.contains(" b  c") || s.endsWith("b  c"))
  }
}
