package graft.streaming

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-node counters with the reference's metric names
  * (`metrics/metrics.go:106-185`: received/success/failure/filtered),
  * captured from the `observe` metrics Pipeline attaches
  * (`<id>.received` / `<id>.emitted`) — zero extra Spark jobs; values
  * arrive on the driver when an action completes (batch) or with each
  * micro-batch progress (streaming).
  */
final class PipelineMetrics(spark: SparkSession) {

  private val counters = TrieMap[String, Long]()
  private val pending = TrieMap[String, Long]()

  /** Within one batch an observe value is IDEMPOTENT: every action that
    * re-evaluates (or serves from cache) the same CollectMetrics node
    * reports the same per-batch total, so `record` keeps the last value
    * per name. `flush` (micro-batch boundary, or snapshot time) folds
    * the per-batch values into the cumulative counters.
    */
  private def record(name: String, row: org.apache.spark.sql.Row): Unit =
    pending(name) = row.getAs[Long]("count")

  private def flush(): Unit =
    pending.keys.toList.foreach { k =>
      pending.remove(k).foreach { v =>
        counters.updateWith(k) { case Some(x) => Some(x + v); case None => Some(v) }
      }
    }

  private val batchListener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) => record(name, row) }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }

  private val streamListener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      e.progress.observedMetrics.asScala.foreach { case (name, row) => record(name, row) }
      flush() // micro-batch boundary
    }
  }

  def install(): this.type = {
    spark.listenerManager.register(batchListener)
    spark.streams.addListener(streamListener)
    this
  }

  def uninstall(): Unit = {
    spark.listenerManager.unregister(batchListener)
    spark.streams.removeListener(streamListener)
  }

  def snapshot: Map[String, Long] = { flush(); counters.toMap }

  /** derived counters per node id: received/emitted/filtered-or-failed. */
  def nodeCounts(id: String): (Long, Long) = {
    flush()
    (counters.getOrElse(s"$id.received", 0L), counters.getOrElse(s"$id.emitted", 0L))
  }

  /** events shed by a `discard_on_full_buffer` node this snapshot
    * (reference DiscardedEvents counter): offered − admitted. Zero for
    * nodes without the flag (no `.offered` metric is emitted), and —
    * max-guarded rather than negative — for a node that combines the
    * flag with an ASYNC stage: its `.offered` observe sits above the
    * exactly-once localCheckpoint break and never reaches a listener
    * (Pipeline.buildNode's async comment), so the exact discard count
    * of that combination is unobservable by design. */
  def discardedEvents(id: String): Long = {
    flush()
    math.max(0L,
      counters.getOrElse(s"$id.offered", 0L) - counters.getOrElse(s"$id.received", 0L))
  }
}
