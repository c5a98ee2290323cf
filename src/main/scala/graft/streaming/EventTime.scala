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
}
