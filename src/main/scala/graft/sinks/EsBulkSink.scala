package graft.sinks

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.model.IndexRequest

/** One document's outcome from a bulk call. */
final case class EsDocResult(docId: String, status: Int, errorType: Option[String] = None)

/** A failed document + its structured error — returned to the caller
  * for error_handler routing (the AsyncEvent.ReturnError analog).
  */
final case class EsIndexFailure(index: String, docId: String, doc: String, code: String, message: String)

/** The transport seam: real deployments implement this with an HTTP
  * bulk client; tests inject failures. Instantiated PER PARTITION on
  * the executor (one connection per task), never serialized with state.
  */
trait EsBulkClient {
  def bulk(docs: Seq[IndexRequest]): Seq[EsDocResult]
  def close(): Unit = ()
}

/** Bulk indexer with the reference's semantics
  * (`node/elasticsearch/elastic_index_client.go`):
  *
  *   - sub-batches of `batchSize` (default 100) inside each partition —
  *     foreachBatch/mapPartitions IS the batcher (`:91-126`)
  *   - request-level failure: exponential backoff 5s·2^i capped at
  *     3 min, retried until `maxRequestAttempts` (reference retries
  *     forever; bounded here so a dead cluster fails the task and Spark
  *     retries/alerts — at 1000 executors "block forever" is an outage
  *     amplifier)
  *   - doc-level: 2xx success; `mapper_parsing_exception` is never
  *     retried (poison pill, `:239-255`); other errors retried
  *     immediately up to `maxRetries`, then surfaced as
  *     FBError("ES_INDEX_ERROR") failures
  *   - connection recycled every `reconnectBatchCount` sub-batches
  *     (`connectionfactory.go:55-91`)
  *
  * `index` returns the failure Dataset so the pipeline can route it to
  * an error_handler — failures stay distributed, nothing is collected
  * on the driver.
  */
final class EsBulkSink(
    clientFactory: () => EsBulkClient,
    batchSize: Int = 100,
    maxRetries: Int = 3,
    reconnectBatchCount: Int = 10000,
    maxRequestAttempts: Int = 100,
    sleeper: Long => Unit = Thread.sleep) extends Serializable {

  private def backoffMs(attempt: Int): Long =
    math.min(180000L, (math.pow(2, attempt.toDouble) * 5000L).toLong)

  /** index all docs in one partition iterator; returns failures. */
  private[sinks] def indexPartition(docs: Iterator[IndexRequest]): Iterator[EsIndexFailure] = {
    var client = clientFactory()
    var batchesOnConnection = 0
    val failures = ListBuffer[EsIndexFailure]()

    def bulkWithRequestRetry(batch: Seq[IndexRequest]): Seq[EsDocResult] = {
      var attempt = 0
      while (true) {
        try return client.bulk(batch)
        catch {
          // a task kill surfaces as InterruptedException from the HTTP
          // client (clearing the interrupt flag): swallowing it into
          // the retry loop would keep a CANCELLED task hammering ES
          // through the full backoff schedule — restore the flag and
          // let the cancellation proceed
          case ie: InterruptedException =>
            Thread.currentThread().interrupt()
            throw ie
          case e: Exception =>
            if (attempt + 1 >= maxRequestAttempts)
              throw new RuntimeException(s"bulk request failed after $maxRequestAttempts attempts", e)
            sleeper(backoffMs(attempt))
            attempt += 1
        }
      }
      Nil // unreachable
    }

    def indexBatch(batch: Seq[IndexRequest], retryCount: Int): Unit = {
      if (batch.isEmpty) return
      batchesOnConnection += 1
      if (batchesOnConnection > reconnectBatchCount) {
        client.close(); client = clientFactory(); batchesOnConnection = 1
      }
      val results = bulkWithRequestRetry(batch)
      // The bulk API returns one item per request IN ORDER — match
      // positionally like the reference's handleErrorResponses
      // (elastic_index_client.go:211-280). Keying by docId would collapse
      // duplicate/empty IDs (the ES auto-ID path sends docId = "" for
      // every doc) and mis-attribute failures.
      require(results.size == batch.size,
        s"bulk returned ${results.size} results for ${batch.size} requests")
      val retry = ListBuffer[IndexRequest]()
      results.zip(batch).foreach { case (res, req) =>
        if (res.status < 200 || res.status > 299) {
          val poison = res.errorType.contains("mapper_parsing_exception")
          if (!poison && retryCount < maxRetries) retry += req
          else failures += EsIndexFailure(req.index, req.docId, req.doc,
            "ES_INDEX_ERROR", s"failed to index to elasticsearch: ${res.errorType.getOrElse("unknown")}")
        }
      }
      if (retry.nonEmpty) indexBatch(retry.toList, retryCount + 1)
    }

    try docs.grouped(batchSize).foreach(b => indexBatch(b.toList, 0))
    finally client.close()
    failures.iterator
  }

  /** distributed entry point: IndexRequest-shaped frame → failures. */
  def index(df: DataFrame): Dataset[EsIndexFailure] = {
    val spark = df.sparkSession
    import spark.implicits._
    val sink = this
    df.selectExpr("index", "mappingType", "docId", "doc").as[IndexRequest]
      .mapPartitions(sink.indexPartition _)
  }
}
