package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

import graft.model.IndexRequest

/** Concrete [[EsBulkClient]] over the Elasticsearch `/_bulk` HTTP API
  * via `java.net.http` — the transport the [[EsBulkSink]] factory seam
  * expects in real deployments.
  *
  * Request shape mirrors the reference client
  * (`node/elasticsearch/elastic_index_client.go:153-209`): NDJSON
  * pairs of an `{"index":{"_index","_type","_id"}}` action line and the
  * raw document JSON, one trailing newline each; an empty docId omits
  * `_id` (the ES auto-ID path). Response parsing mirrors
  * `handleErrorResponses` (`elastic_index_client.go:211-280`): one
  * result per request IN ORDER from `items[*].index.{status,error.type}`.
  *
  * Failure split:
  *  - transport errors / non-2xx HTTP on the whole request → throw, so
  *    [[EsBulkSink]] applies its exponential request backoff
  *  - per-doc statuses (including doc-level 429s) → [[EsDocResult]]s,
  *    so the sink's doc retry / poison-pill policy decides
  *
  * One instance per partition (built by the sink's client factory, and
  * rebuilt by its `reconnectBatchCount` recycling —
  * `connectionfactory.go:55-91`); never serialized with state.
  */
final class EsHttpBulkClient(baseUrl: String, timeoutMs: Long = 30000L)
    extends EsBulkClient {

  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs))
    .build()
  private val mapper = new ObjectMapper()

  override def bulk(docs: Seq[IndexRequest]): Seq[EsDocResult] = {
    val body = new java.lang.StringBuilder
    docs.foreach { d =>
      val meta = mapper.createObjectNode()
      val idx = meta.putObject("index")
      idx.put("_index", d.index)
      if (d.mappingType.nonEmpty) idx.put("_type", d.mappingType)
      if (d.docId.nonEmpty) idx.put("_id", d.docId)
      body.append(mapper.writeValueAsString(meta)).append('\n')
      body.append(d.doc).append('\n')
    }
    val req = HttpRequest.newBuilder(URI.create(s"$baseUrl/_bulk"))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/x-ndjson")
      .POST(HttpRequest.BodyPublishers.ofString(body.toString))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() < 200 || resp.statusCode() > 299)
      throw new RuntimeException(
        s"bulk HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    val items = mapper.readTree(resp.body()).get("items")
    require(items != null && items.isArray,
      "bulk response has no items array")
    (0 until items.size()).map { i =>
      // each item is {"<op>": {...}}; ours are always "index" ops
      val op = items.get(i).get("index")
      require(op != null, s"bulk response item $i is not an index op")
      EsDocResult(
        docId = Option(op.get("_id")).map(_.asText()).getOrElse(""),
        status = op.get("status").asInt(),
        errorType = Option(op.get("error")).filterNot(_.isNull)
          .flatMap(e => Option(e.get("type")).map(_.asText())))
    }
  }
}
