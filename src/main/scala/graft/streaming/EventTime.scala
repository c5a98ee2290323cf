package graft.streaming

import org.apache.spark.sql.{DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._

/** Event-time windowing for streams — beyond the reference's surface
  * (it has no time windowing, README.md:47-49) but core to a Spark
  * streaming engine: tumbling/sliding/session windows with watermarked
  * late-data handling. Thin, typed entry points over Spark's native
  * operators (which is the whole point — no custom state store).
  */
object EventTime {

  /** tumbling window group: one bucket per `width` interval. */
  def tumbling(df: DataFrame, tsCol: String, width: String,
               watermarkDelay: Option[String] = None, keys: Seq[String] = Nil): RelationalGroupedDataset = {
    val wm = watermarkDelay.fold(df)(d => df.withWatermark(tsCol, d))
    wm.groupBy(window(col(tsCol), width) +: keys.map(col): _*)
  }

  /** sliding window group. */
  def sliding(df: DataFrame, tsCol: String, width: String, slide: String,
              watermarkDelay: Option[String] = None, keys: Seq[String] = Nil): RelationalGroupedDataset = {
    val wm = watermarkDelay.fold(df)(d => df.withWatermark(tsCol, d))
    wm.groupBy(window(col(tsCol), width, slide) +: keys.map(col): _*)
  }

  /** session window group: windows close after `gap` inactivity. */
  def session(df: DataFrame, tsCol: String, gap: String,
              watermarkDelay: Option[String] = None, keys: Seq[String] = Nil): RelationalGroupedDataset = {
    val wm = watermarkDelay.fold(df)(d => df.withWatermark(tsCol, d))
    wm.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
  }

  /** Event-time streaming dedup: suppress key duplicates arriving
    * within the watermark horizon, with state expired by EVENT time —
    * the replay-correct counterpart of
    * [[StatefulOps.streamingDedup]]'s processing-time TTL. Under a
    * fast historical replay a wall-clock TTL expires (almost) nothing
    * and state grows with the whole replayed keyspace; under lagging
    * live traffic it expires state the data's own clock says is still
    * current. Watermark-driven expiry keys retention to the stream's
    * event time in both cases. Thin over Spark's native
    * `dropDuplicatesWithinWatermark` — the whole point: the state
    * store, expiry and exactly-once bookkeeping are Spark's.
    *
    * Semantics per Spark: the FIRST arrival of a key is emitted;
    * further arrivals are dropped for at least `delay` of event time;
    * once the watermark passes, the key may be emitted again (use
    * [[StatefulOps.streamingDedup]] with ttlMs=0 for forever-dedup).
    * State ≈ keys seen within one watermark window — bounded by key
    * arrival rate × delay, independent of stream length.
    */
  def dedupWithinWatermark(
      df: DataFrame, keys: Seq[String], tsCol: String, delay: String): DataFrame = {
    require(keys.nonEmpty, "dedupWithinWatermark: need at least one key column")
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
  }

  /** Watermarked stream-stream interval join (click-attribution shape):
    * rows match when keys are equal and
    * `leftTs + lower <= rightTs <= leftTs + upper`.
    *
    * Both sides carry a watermark and the join condition bounds event
    * time in BOTH directions, so Spark can size the join state and
    * expire rows — without the time bound a stream-stream join buffers
    * forever. State per side ≈ watermark delay + interval span of
    * input, independent of total stream length: the property that keeps
    * the join alive on an unbounded stream.
    *
    * Non-key columns must be disjoint (same contract as asofJoin).
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      lower: String, upper: String,
      leftWatermark: String, rightWatermark: String,
      joinType: String = "inner"): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - key
    require(overlap.isEmpty,
      s"intervalJoin: non-key columns on both sides: ${overlap.mkString(", ")}")
    val l = left.withWatermark(leftTs, leftWatermark).as("l")
    val r = right.withWatermark(rightTs, rightWatermark).as("r")
    l.join(r, expr(
      s"""l.$key = r.$key AND
         |r.$rightTs >= l.$leftTs + interval '$lower' AND
         |r.$rightTs <= l.$leftTs + interval '$upper'""".stripMargin),
      joinType)
      .drop(col(s"r.$key"))
  }
}
