package graft.streaming

/** Pure offset arithmetic for capped-lag startup and parallel recovery.
  * Kept side-effect free so the same logic drives the driver-side Kafka
  * orchestration, the DataFrame-native query (`fb_capped_lag`), and
  * property tests.
  */
object OffsetMath {

  /** Where a partition starts, and the skipped range to recover, given
    * committed offset, high watermark and max initial partition lag —
    * the decision table of `calculateAssignmentOffsets`
    * (`node/kafkaconsumer/kafkaconsumer.go:336-384`):
    *
    *   - committed invalid (<0) → treat as 0
    *   - high − committed ≤ maxLag → start at committed, no recovery
    *   - maxLag > high → start at 0 (new/short topic), no recovery
    *   - else → start at high − maxLag, recover [committed, high−maxLag)
    */
  final case class Assignment(start: Long, recover: Option[(Long, Long)])

  def cappedStart(committed: Long, high: Long, maxLag: Long): Assignment = {
    val c = if (committed < 0) 0L else committed
    if (high - c <= maxLag) Assignment(c, None)
    else if (maxLag > high) Assignment(0L, None)
    else {
      val start = high - maxLag
      Assignment(start, Some((c, start)))
    }
  }

  /** Cap a recovery request's volume: at most `maxRecords` replayed per
    * partition, keeping the NEWEST part of the range
    * (`recoveryconsumer.go:328-343`: from = to − max).
    */
  def capRecovery(from: Long, to: Long, maxRecords: Long): (Long, Long) =
    if (maxRecords > 0 && to - from > maxRecords) (to - maxRecords, to) else (from, to)

  /** Rate limit → micro-batch size: `parallelrecoverymaxrate` events/s
    * times the trigger interval (`recoveryconsumer.go:108`, applied
    * `:301`) becomes maxOffsetsPerTrigger on the recovery query.
    */
  def recoveryMaxOffsetsPerTrigger(maxRatePerSec: Long, triggerIntervalMs: Long): Long =
    math.max(1L, maxRatePerSec * triggerIntervalMs / 1000L)

  /** startingOffsets/endingOffsets JSON for a bounded replay query. */
  def offsetsJson(topic: String, partitionOffsets: Map[Int, Long]): String =
    partitionOffsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }
      .mkString(s"""{"$topic":{""", ",", "}}")
}
