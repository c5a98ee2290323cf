package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over `KeyValueGroupedDataset` — the Structured
  * Streaming path for semantics the built-in windowed aggregations
  * can't express. Used for streaming exact-dedup: the batch operator
  * (`graft.operators.Dedup.exact`) needs the whole key group; on an
  * unbounded stream the group never completes, so first-seen-wins with
  * TTL'd state is the standard scale shape (state size = live key
  * cardinality, bounded by the TTL watermark, partitioned by key hash
  * across executors).
  */
object StatefulOps {

  final case class Keyed(key: String, value: String, tsMillis: Long)
  final case class DedupResult(key: String, value: String, tsMillis: Long, dupOfCount: Long)
  final case class SeenState(firstTsMillis: Long, count: Long)

  implicit val keyedEnc: Encoder[Keyed] = Encoders.product[Keyed]
  implicit val resultEnc: Encoder[DedupResult] = Encoders.product[DedupResult]
  implicit val stateEnc: Encoder[SeenState] = Encoders.product[SeenState]
  implicit val stringEnc: Encoder[String] = Encoders.STRING

  /** Per-group transition, factored out so it is unit-testable with
    * Spark's public `TestGroupState`. Emits only the FIRST event per
    * key; later duplicates bump a per-key counter and are suppressed.
    * With `ttlMs > 0`, state for a key expires that long after its last
    * update (processing-time TTL), so the state store stays bounded on
    * an unbounded stream — a key re-arriving after expiry is treated as
    * new, the documented at-least-once-compatible behavior (downstream
    * handlers must stay idempotent, as the reference's messaging
    * contract already requires, `docs/messaging.md:78-82`).
    */
  def dedupGroup(key: String, rows: Iterator[Keyed], state: GroupState[SeenState],
                 ttlMs: Long): Iterator[DedupResult] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val batch = rows.toSeq
      val prior = state.getOption
      val all = prior.map(_.count).getOrElse(0L) + batch.size
      val firstTs = prior.map(_.firstTsMillis)
        .getOrElse(batch.map(_.tsMillis).min)
      state.update(SeenState(firstTs, all))
      if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
      if (prior.isEmpty)
        Iterator.single {
          val first = batch.minBy(_.tsMillis)
          DedupResult(key, first.value, first.tsMillis, batch.size - 1L)
        }
      else Iterator.empty
    }

  def streamingDedup(events: Dataset[Keyed], ttlMs: Long): Dataset[DedupResult] = {
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[SeenState, DedupResult](OutputMode.Append, timeout) {
        (key: String, rows: Iterator[Keyed], state: GroupState[SeenState]) =>
          dedupGroup(key, rows, state, ttlMs)
      }
  }
}
