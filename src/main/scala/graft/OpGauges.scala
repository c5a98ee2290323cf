package graft

import scala.collection.concurrent.TrieMap

/** Driver-side gauges for BATCH operators with run-level forensics
  * (convergence rounds, fallback switches) — the operator counterpart
  * of [[graft.streaming.PipelineMetrics]]'s per-node event counters.
  *
  * Operators whose control loop runs on the driver (connected
  * components' fixpoint, IVF's Lloyd loop) already know these values
  * exactly; publishing them here costs one map write and makes a 100×
  * run's convergence behavior visible on `/metrics` instead of only in
  * driver logs. Values are last-run gauges plus monotonic `_total`
  * counters where accumulation matters.
  */
object OpGauges {

  private val gauges = TrieMap[String, Long]()

  def set(name: String, value: Long): Unit = gauges(name) = value

  def inc(name: String, delta: Long = 1L): Unit =
    gauges.updateWith(name) { case Some(x) => Some(x + delta); case None => Some(delta) }

  def snapshot: Map[String, Long] = gauges.toMap

  /** test isolation hook — gauges are process-global. */
  def clear(): Unit = gauges.clear()
}
