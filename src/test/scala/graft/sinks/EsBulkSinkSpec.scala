package graft.sinks

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.model.IndexRequest

/** ES bulk sink semantics (`elastic_index_client.go`): sub-batching,
  * immediate doc retries, poison-pill mapper exceptions, max-retry
  * dead-lettering, request-level backoff, connection recycling.
  */
class EsBulkSinkSpec extends SparkSpec {

  private def reqs(n: Int) = (1 to n).map(i => IndexRequest("logs", "_doc", s"d$i", s"""{"n":$i}"""))

  test("all-success batch produces no failures and respects batch size") {
    val batchSizes = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val sink = new EsBulkSink(() => new EsBulkClient {
      def bulk(docs: Seq[IndexRequest]) = { batchSizes.add(docs.size); docs.map(d => EsDocResult(d.docId, 201)) }
    }, batchSize = 10)
    val failures = sink.indexPartition(reqs(25).iterator).toList
    assert(failures.isEmpty)
    import scala.jdk.CollectionConverters._
    assert(batchSizes.asScala.toList == List(10, 10, 5))
  }

  test("transient doc errors retry immediately and succeed") {
    val attempts = new AtomicInteger
    val sink = new EsBulkSink(() => new EsBulkClient {
      def bulk(docs: Seq[IndexRequest]) = docs.map { d =>
        if (d.docId == "d1" && attempts.getAndIncrement() < 2) EsDocResult(d.docId, 503, Some("es_rejected_execution_exception"))
        else EsDocResult(d.docId, 200)
      }
    }, batchSize = 10, maxRetries = 3)
    assert(sink.indexPartition(reqs(3).iterator).isEmpty)
    assert(attempts.get() >= 2)
  }

  test("mapper_parsing_exception is a poison pill: dead-lettered, never retried") {
    val calls = new AtomicInteger
    val sink = new EsBulkSink(() => new EsBulkClient {
      def bulk(docs: Seq[IndexRequest]) = { calls.incrementAndGet(); docs.map { d =>
        if (d.docId == "d2") EsDocResult(d.docId, 400, Some("mapper_parsing_exception"))
        else EsDocResult(d.docId, 200) } }
    }, batchSize = 10, maxRetries = 3)
    val failures = sink.indexPartition(reqs(3).iterator).toList
    assert(failures.map(_.docId) == List("d2"))
    assert(failures.head.code == "ES_INDEX_ERROR")
    assert(calls.get() == 1) // no retry round for the poison pill
  }

  test("doc errors exhaust maxRetries then dead-letter") {
    val sink = new EsBulkSink(() => new EsBulkClient {
      def bulk(docs: Seq[IndexRequest]) = docs.map(d => EsDocResult(d.docId, 500, Some("boom")))
    }, batchSize = 10, maxRetries = 2)
    val failures = sink.indexPartition(reqs(4).iterator).toList
    assert(failures.size == 4)
    assert(failures.forall(_.message.contains("boom")))
  }

  test("request-level failure backs off exponentially capped at 3 minutes") {
    val sleeps = new java.util.concurrent.CopyOnWriteArrayList[Long]()
    val tries = new AtomicInteger
    val sink = new EsBulkSink(
      () => new EsBulkClient {
        def bulk(docs: Seq[IndexRequest]) =
          if (tries.incrementAndGet() <= 7) throw new RuntimeException("cluster down")
          else docs.map(d => EsDocResult(d.docId, 200))
      },
      batchSize = 10, sleeper = sleeps.add(_))
    assert(sink.indexPartition(reqs(1).iterator).isEmpty)
    import scala.jdk.CollectionConverters._
    assert(sleeps.asScala.toList == List(5000L, 10000L, 20000L, 40000L, 80000L, 160000L, 180000L))
  }

  test("connection recycled every reconnectBatchCount batches") {
    val connections = new AtomicInteger
    val sink = new EsBulkSink(() => new EsBulkClient {
      val id = connections.incrementAndGet()
      def bulk(docs: Seq[IndexRequest]) = docs.map(d => EsDocResult(d.docId, 200))
    }, batchSize = 1, reconnectBatchCount = 3)
    sink.indexPartition(reqs(10).iterator).toList
    assert(connections.get() == 4) // 10 single-doc batches / 3 per connection
  }

  test("empty/duplicate doc IDs (ES auto-ID path) are matched positionally") {
    // docbuilder/elasticsearch stages set doc_id = "" for every doc —
    // results MUST map back to requests by position, not by id.
    val docs = (1 to 4).map(i => IndexRequest("logs", "_doc", "", s"""{"n":$i}"""))
    val sink = new EsBulkSink(() => new EsBulkClient {
      def bulk(ds: Seq[IndexRequest]) = ds.zipWithIndex.map { case (d, i) =>
        if (i == 2) EsDocResult(d.docId, 400, Some("mapper_parsing_exception"))
        else EsDocResult(d.docId, 201)
      }
    }, batchSize = 10)
    val failures = sink.indexPartition(docs.iterator).toList
    assert(failures.size == 1)
    assert(failures.head.doc == """{"n":3}""") // the third request, by position
  }

  test("result-count mismatch with the batch fails loudly") {
    val sink = new EsBulkSink(() => new EsBulkClient {
      def bulk(ds: Seq[IndexRequest]) = ds.take(1).map(d => EsDocResult(d.docId, 200))
    }, batchSize = 10)
    intercept[IllegalArgumentException] { sink.indexPartition(reqs(3).iterator).toList }
  }

  test("distributed path: failures come back as a Dataset") {
    val s = spark
    import s.implicits._
    val df = reqs(6).toDF()
    val sink = new EsBulkSink(() => new EsBulkClient {
      def bulk(docs: Seq[IndexRequest]) = docs.map(d =>
        if (d.docId == "d3") EsDocResult(d.docId, 400, Some("mapper_parsing_exception"))
        else EsDocResult(d.docId, 200))
    }, batchSize = 2)
    val failures = sink.index(df).collect()
    assert(failures.map(_.docId).toList == List("d3"))
  }
}
