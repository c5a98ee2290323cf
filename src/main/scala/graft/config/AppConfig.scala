package graft.config

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** Pipeline YAML configuration — same schema, defaults and validation
  * rules (and error messages) as the reference's `config/config.go:39-237`,
  * re-validated against a schema-aware registry instead of Go
  * reflect.Type.
  */
final case class NodeConf(
    name: String,
    id: String,
    workers: Int,
    bufferSize: Int,
    params: Map[String, String],
    children: List[NodeConf],
    errorHandler: Option[NodeConf],
    disabled: Boolean,
    discardOnFullBuffer: Boolean)

final case class SourceConf(name: String, params: Map[String, String])

final case class InternalDataConf(transport: String, params: Map[String, String])

final case class AppConfig(
    applicationName: String,
    metricsPrefix: String,
    metricsPort: Int,
    internalData: Option[InternalDataConf],
    source: SourceConf,
    nodes: List[NodeConf],
    shutdownTimeout: Int,
    /** shared directory for multi-instance leader election (the analog
      * of the reference's `zookeeper`+`zkleaderelectionpath`,
      * `config/config.go:20-21`); None = single-instance, driver leads. */
    leaderElectionPath: Option[String] = None)

/** What a node/source type declares it consumes/produces — the Spark
  * analog of the reference registry's `reflect.Type` tags
  * (`node/registry.go:25-30`). Schema compatibility is checked at
  * config-read time, before any data flows (`config/config.go:127-172`).
  */
object TypeTags {
  val Bytes = "[]uint8"
  val EventError = "*firebolt.EventError"
}

trait RegistryView {
  /** produces-type of a registered source, or None if unregistered. */
  def sourceProduces(name: String): Option[String]
  /** (consumes, produces) of a registered node, or None. */
  def nodeTypes(name: String): Option[(String, String)]
}

object AppConfig {

  def read(path: String, registry: RegistryView): Either[String, AppConfig] = {
    val raw =
      try Files.readString(Paths.get(path))
      catch { case e: Exception => return Left(s"failed to read config file: ${e.getMessage}") }
    parse(raw, registry)
  }

  def parse(raw: String, registry: RegistryView): Either[String, AppConfig] = {
    val expanded = expandEnv(raw)
    val root =
      try Option(new Yaml().load[java.util.Map[String, Object]](expanded))
        .getOrElse(return Left("config file parse error: empty config"))
      catch { case e: Exception => return Left(s"config file parse error: ${e.getMessage}") }

    val cfg0 =
      try fromYaml(root)
      catch { case e: Exception => return Left(s"config file parse error: ${e.getMessage}") }

    val cfg = withDefaults(cfg0)
    validate(cfg, registry).map(_ => cfg)
  }

  /** `${VAR}` env expansion, as the reference does with os.ExpandEnv
    * (`config/config.go:49`). Unset vars expand to "".
    */
  private[config] def expandEnv(s: String): String =
    "\\$\\{([A-Za-z_][A-Za-z0-9_]*)\\}".r
      .replaceAllIn(s, m => scala.util.matching.Regex.quoteReplacement(sys.env.getOrElse(m.group(1), "")))

  // ---- YAML → model ----

  private def str(m: java.util.Map[String, Object], k: String, d: String = ""): String =
    Option(m.get(k)).map(_.toString).getOrElse(d)

  private def int(m: java.util.Map[String, Object], k: String, d: Int = 0): Int =
    Option(m.get(k)).map(_.toString.toInt).getOrElse(d)

  private def bool(m: java.util.Map[String, Object], k: String): Boolean =
    Option(m.get(k)).exists(_.toString == "true")

  private def params(m: java.util.Map[String, Object], k: String): Map[String, String] =
    Option(m.get(k)) match {
      case Some(mm: java.util.Map[_, _]) =>
        mm.asScala.map { case (a, b) => a.toString -> Option(b).map(_.toString).getOrElse("") }.toMap
      case _ => Map.empty
    }

  private def nodeFromYaml(m: java.util.Map[String, Object]): NodeConf = {
    val children = Option(m.get("children")) match {
      case Some(l: java.util.List[_]) =>
        l.asScala.toList.map(c => nodeFromYaml(c.asInstanceOf[java.util.Map[String, Object]]))
      case _ => Nil
    }
    val eh = Option(m.get("error_handler")).map(e => nodeFromYaml(e.asInstanceOf[java.util.Map[String, Object]]))
    NodeConf(
      name = str(m, "name"),
      id = str(m, "id"),
      workers = int(m, "workers"),
      bufferSize = int(m, "buffersize"),
      params = params(m, "params"),
      children = children,
      errorHandler = eh,
      disabled = bool(m, "disabled"),
      discardOnFullBuffer = bool(m, "discard_on_full_buffer"))
  }

  private def fromYaml(root: java.util.Map[String, Object]): AppConfig = {
    val internal = Option(root.get("internaldata")).map { o =>
      val m = o.asInstanceOf[java.util.Map[String, Object]]
      InternalDataConf(str(m, "transport"), params(m, "params"))
    }
    val source = Option(root.get("source")).map { o =>
      val m = o.asInstanceOf[java.util.Map[String, Object]]
      SourceConf(str(m, "name"), params(m, "params"))
    }.getOrElse(SourceConf("", Map.empty))
    val nodes = Option(root.get("nodes")) match {
      case Some(l: java.util.List[_]) =>
        l.asScala.toList.map(n => nodeFromYaml(n.asInstanceOf[java.util.Map[String, Object]]))
      case _ => Nil
    }
    AppConfig(
      applicationName = str(root, "application"),
      metricsPrefix = str(root, "metricsprefix"),
      leaderElectionPath = Option(str(root, "leaderelectionpath")).filter(_.nonEmpty),
      metricsPort = int(root, "metricsport"),
      internalData = internal,
      source = source,
      nodes = nodes,
      shutdownTimeout = int(root, "shutdowntimeout"))
  }

  // ---- defaults (config/config.go:213-237, :65-67) ----

  private def nodeDefaults(n: NodeConf): NodeConf =
    n.copy(
      id = if (n.id.isEmpty) n.name else n.id,
      workers = if (n.workers == 0) 1 else n.workers,
      bufferSize = if (n.bufferSize == 0) 1 else n.bufferSize,
      children = n.children.map(nodeDefaults),
      errorHandler = n.errorHandler.map(nodeDefaults))

  private def withDefaults(c: AppConfig): AppConfig =
    c.copy(
      nodes = c.nodes.map(nodeDefaults),
      shutdownTimeout = if (c.shutdownTimeout <= 0) 10 else c.shutdownTimeout)

  // ---- validation (config/config.go:73-210) ----

  def validate(c: AppConfig, registry: RegistryView): Either[String, Unit] = {
    for {
      _ <- validateUniqueIds(c.nodes)
      _ <- validateInternalData(c)
      _ <- validateSource(c, registry)
      _ <- firstError(c.nodes)(validateNode(_, registry))
    } yield ()
  }

  private def firstError[A](xs: List[A])(f: A => Either[String, Unit]): Either[String, Unit] =
    xs.foldLeft[Either[String, Unit]](Right(())) { (acc, x) => acc.flatMap(_ => f(x)) }

  private def validateUniqueIds(nodes: List[NodeConf]): Either[String, Unit] = {
    // NOTE: the reference's recursion stops at the first child
    // (`config/config.go:148-151` returns inside the loop); we check the
    // whole tree — a strict superset that still passes its fixtures.
    val seen = scala.collection.mutable.Set[String]()
    def walk(n: NodeConf): Either[String, Unit] = {
      if (seen.contains(n.id))
        Left(s"multiple nodes exist with the same id ${n.id}; set an explicit 'id' in your config to make them unique")
      else {
        seen += n.id
        firstError(n.children)(walk)
      }
    }
    firstError(nodes)(walk)
  }

  /** `kafka` is the reference's transport (config.go:109-113); `file`
    * is the Spark-native equivalent — the driver is the compacted
    * topic's only consumer here, so an append-only compacted JSONL file
    * carries the same replay-to-EOF semantics (see FileMessageBus).
    */
  private def validateInternalData(c: AppConfig): Either[String, Unit] =
    c.internalData match {
      case Some(idc) if idc.transport != "kafka" && idc.transport != "file" =>
        Left(s"internal data transport ${idc.transport} not supported")
      case Some(idc) if idc.transport == "file" && !idc.params.contains("path") =>
        Left("missing config value [path] for internal data transport file")
      case _ => Right(())
    }

  private def validateSource(c: AppConfig, registry: RegistryView): Either[String, Unit] =
    registry.sourceProduces(c.source.name) match {
      case None => Left(s"source type ${c.source.name} not registered")
      case Some(produces) =>
        firstError(c.nodes) { n =>
          registry.nodeTypes(n.name) match {
            case None => Left(s"node type ${n.name} not registered")
            case Some((consumes, _)) if produces != consumes =>
              Left(s"source type ${c.source.name} produces $produces, but root node ${n.name} consumes incompatible type $consumes")
            case _ => Right(())
          }
        }
    }

  private def validateNode(n: NodeConf, registry: RegistryView): Either[String, Unit] =
    registry.nodeTypes(n.name) match {
      case None => Left(s"node type ${n.name} not registered")
      case Some((_, produces)) =>
        for {
          _ <- firstError(n.children) { child =>
            registry.nodeTypes(child.name) match {
              case None => Left(s"node type ${child.name} not registered")
              case Some((childConsumes, _)) if produces != childConsumes =>
                Left(s"node type ${n.name} produces $produces, but child ${child.name} consumes incompatible type $childConsumes")
              case _ => Right(())
            }
          }
          _ <- n.errorHandler.map(validateErrorHandler(_, registry)).getOrElse(Right(()))
          _ <- firstError(n.children)(validateNode(_, registry))
        } yield ()
    }

  private def validateErrorHandler(n: NodeConf, registry: RegistryView): Either[String, Unit] =
    if (n.children.nonEmpty)
      Left(s"error_handler nodes may not have children for node ${n.id}")
    else if (n.errorHandler.isDefined)
      Left(s"error_handler nodes may not have an error_handler of their own for node ${n.id}")
    else registry.nodeTypes(n.name) match {
      case None => Left(s"error_handler node type ${n.name} not registered")
      case Some((consumes, _)) if consumes != TypeTags.EventError =>
        Left(s"error_handler node type ${n.name} must consume EventError, actually consumes $consumes")
      case _ => Right(())
    }
}
