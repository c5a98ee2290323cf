package graft.sinks

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.model.IndexRequest

/** The real `java.net.http` bulk client driven against a local stub
  * `/_bulk` server — verifies the wire shape of
  * `elastic_index_client.go:153-209` (NDJSON action/doc pairs,
  * ndjson content type, auto-ID) and the full [[EsBulkSink]] policy
  * stack (429 doc retry, mapper_parsing_exception poison pill,
  * request-level backoff) over a genuine HTTP round trip.
  */
class EsHttpBulkClientSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val mapper = new ObjectMapper()

  /** Stub ES: parses NDJSON bulk bodies; per-doc behavior is driven by
    * the doc content, request-level failures by a countdown.
    *  - doc containing "poison" → 400 mapper_parsing_exception
    *  - doc containing "flaky"  → 429 es_rejected on its first
    *    appearance, 200 afterwards
    *  - failRequestsRemaining > 0 → whole request answers 503
    */
  private class StubEs {
    val requests = new CopyOnWriteArrayList[String]()
    val contentTypes = new CopyOnWriteArrayList[String]()
    val failRequestsRemaining = new AtomicInteger(0)
    private val seenFlaky = new CopyOnWriteArrayList[String]()

    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_bulk", (ex: HttpExchange) => handle(ex))
    server.start()
    val baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}"

    private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }

    private def handle(ex: HttpExchange): Unit = {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      requests.add(body)
      contentTypes.add(ex.getRequestHeaders.getFirst("Content-Type"))
      if (failRequestsRemaining.getAndUpdate(n => math.max(0, n - 1)) > 0) {
        respond(ex, 503, """{"error":"unavailable"}""")
        return
      }
      val lines = body.split("\n").filter(_.nonEmpty)
      val items = lines.grouped(2).map { case Array(meta, doc) =>
        val id = Option(mapper.readTree(meta).get("index").get("_id"))
          .map(_.asText()).getOrElse("")
        if (doc.contains("poison"))
          s"""{"index":{"_id":"$id","status":400,"error":{"type":"mapper_parsing_exception","reason":"bad field"}}}"""
        else if (doc.contains("flaky") && !seenFlaky.contains(doc)) {
          seenFlaky.add(doc)
          s"""{"index":{"_id":"$id","status":429,"error":{"type":"es_rejected_execution_exception","reason":"queue full"}}}"""
        } else s"""{"index":{"_id":"$id","status":201}}"""
      }.mkString(",")
      respond(ex, 200, s"""{"took":1,"errors":false,"items":[$items]}""")
    }

    def stop(): Unit = server.stop(0)
  }

  private var es: StubEs = _
  override def beforeAll(): Unit = es = new StubEs
  override def afterAll(): Unit = es.stop()

  private def newSink(maxRetries: Int = 3) = new EsBulkSink(
    clientFactory = () => new EsHttpBulkClient(es.baseUrl),
    batchSize = 100, maxRetries = maxRetries, sleeper = _ => ())

  test("happy path: NDJSON wire shape, content type, per-doc results") {
    es.requests.clear(); es.contentTypes.clear()
    val docs = Seq(
      IndexRequest("logs", "_doc", "a1", """{"v":1}"""),
      IndexRequest("logs", "_doc", "", """{"v":2}""")) // auto-ID
    val failures = newSink().indexPartition(docs.iterator).toList
    assert(failures.isEmpty)
    assert(es.requests.size == 1)
    val lines = es.requests.get(0).split("\n")
    assert(lines.length == 4, "two action/doc NDJSON pairs")
    assert(lines(0) == """{"index":{"_index":"logs","_type":"_doc","_id":"a1"}}""")
    assert(lines(1) == """{"v":1}""")
    // empty docId omits _id entirely (ES assigns the ID)
    assert(lines(2) == """{"index":{"_index":"logs","_type":"_doc"}}""")
    assert(es.contentTypes.asScala.toSet == Set("application/x-ndjson"))
  }

  test("doc-level 429 is retried through the real transport and succeeds") {
    es.requests.clear()
    val docs = Seq(
      IndexRequest("logs", "_doc", "f1", """{"flaky":"once-a"}"""),
      IndexRequest("logs", "_doc", "ok", """{"v":3}"""))
    val failures = newSink().indexPartition(docs.iterator).toList
    assert(failures.isEmpty, s"429 doc should succeed on retry: $failures")
    assert(es.requests.size == 2, "initial bulk + one retry bulk")
    // the retry bulk carries ONLY the rejected doc
    assert(es.requests.get(1).contains("once-a") && !es.requests.get(1).contains("\"ok\""))
  }

  test("mapper_parsing_exception over HTTP is a poison pill: one attempt, dead-lettered") {
    es.requests.clear()
    val docs = Seq(
      IndexRequest("logs", "_doc", "p1", """{"poison":true}"""),
      IndexRequest("logs", "_doc", "g1", """{"v":4}"""))
    val failures = newSink().indexPartition(docs.iterator).toList
    assert(failures.map(_.docId) == List("p1"))
    assert(failures.head.code == "ES_INDEX_ERROR")
    assert(failures.head.message.contains("mapper_parsing_exception"))
    val attempts = es.requests.asScala.count(_.contains("poison"))
    assert(attempts == 1, s"poison doc must never be retried, saw $attempts attempts")
  }

  test("request-level 503 backs off and the whole batch eventually lands") {
    es.requests.clear()
    es.failRequestsRemaining.set(2)
    val sleeps = scala.collection.mutable.ListBuffer[Long]()
    val sink = new EsBulkSink(
      clientFactory = () => new EsHttpBulkClient(es.baseUrl),
      sleeper = sleeps.append(_))
    val failures = sink.indexPartition(Seq(
      IndexRequest("logs", "_doc", "r1", """{"v":5}""")).iterator).toList
    assert(failures.isEmpty)
    assert(es.requests.size == 3, "two 503s + the success")
    assert(sleeps.toList == List(5000L, 10000L), "exponential 5s·2^i backoff")
  }
}
