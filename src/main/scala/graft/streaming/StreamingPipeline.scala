package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.config.AppConfig
import graft.pipeline.{Pipeline, Registry}
import graft.sinks.Sink

/** Streaming execution of a config tree: one foreachBatch query over
  * the source stream; inside each micro-batch the SAME Pipeline fold
  * used by batch mode runs against the cached batch, and every leaf /
  * dead-letter branch writes to its configured sink.
  *
  * This is SURVEY §7 hard part (a) handled structurally: the micro
  * batch is persisted ONCE, so success/filtered/error splits never
  * re-read the source, and all sinks observe a consistent batch.
  *
  * Reference semantics carried over (`executor/executor.go:142-207`):
  * source→roots broadcast and parent→children replication happen by
  * DataFrame reuse; `buffersize` maps to maxOffsetsPerTrigger on the
  * source; graceful shutdown = stop() after the in-flight batch
  * completes (micro-batch boundaries replace channel draining).
  */
object StreamingPipeline {

  final case class Running(query: StreamingQuery) {
    /** stop the stream — the analog of cascade-close draining
      * (`executor.go:368-395`), with Spark's semantics: `stop()`
      * interrupts the execution thread, so an in-flight micro-batch is
      * CANCELLED rather than drained, and not checkpointed — it re-runs
      * whole on restart. That is exactly why every bundled sink is
      * idempotent per (sink, batchId) (`IdempotentParquetSink`,
      * EsBulkSink doc-id upserts): replay-safe sinks make cancel+rerun
      * equivalent to a drain. Non-idempotent custom sinks should
      * drain explicitly (await a quiet trigger) before calling this. */
    def shutdown(): Unit = query.stop()
    def awaitTermination(): Unit = query.awaitTermination()
  }

  def run(
      source: DataFrame,
      config: AppConfig,
      registry: Registry,
      sinks: Map[String, Sink],
      deadLetterSinks: Map[String, Sink] = Map.empty,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      queryName: String = "graft-pipeline",
      observeMetrics: Boolean = true): Running = {

    val writer = source.writeStream
      .queryName(queryName)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cached = batch.persist()
        // the OUTER finally guards the micro-batch cache even when
        // buildOn itself throws (a schema-dependent node expression can
        // fail analysis per batch) — without it every failed batch
        // leaks a persisted frame and a restart-supervised stream
        // bleeds storage memory failure after failure. The inner
        // finally unpersists the per-node MEMORY_AND_DISK caches
        // Pipeline.buildOn created.
        try {
          val built = Pipeline.buildOn(cached, config.nodes, registry,
            observeMetrics = observeMetrics, persistShared = true)
          try {
            built.leaves.foreach { case (id, df) =>
              sinks.get(id).foreach(_.writeBatch(df, batchId))
            }
            walk(built.roots).foreach { node =>
              for {
                dead <- node.deadLetters
                sink <- deadLetterSinks.get(node.conf.id)
              } sink.writeBatch(dead, batchId)
            }
          } finally { built.unpersistAll(); () }
        } finally { cached.unpersist(); () }
      }

    val withCp = checkpoint.fold(writer)(cp => writer.option("checkpointLocation", cp))
    Running(withCp.start())
  }

  private def walk(nodes: List[Pipeline.BuiltNode]): List[Pipeline.BuiltNode] =
    nodes.flatMap(n => n :: walk(n.children))
}
