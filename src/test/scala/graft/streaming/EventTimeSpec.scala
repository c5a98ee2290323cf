package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Sliding and session event-time windows over streams (tumbling is
  * covered in StreamingPipelineSpec); watermarked late-data expiry for
  * session windows in append mode.
  */
class EventTimeSpec extends SparkSpec {

  private def t(m: Int, sec: Int = 0) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:$sec%02d")

  test("sliding window: each event lands in width/slide overlapping windows") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(Timestamp, Double)](s)
    val agg = EventTime.sliding(input.toDF().toDF("ts", "value"),
      "ts", width = "10 minutes", slide = "5 minutes")
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    val q = agg.writeStream.format("memory").queryName("slidewin")
      .outputMode("update").trigger(Trigger.ProcessingTime(0L)).start()
    try {
      input.addData(Seq((t(7), 1.0), (t(12), 10.0)))
      q.processAllAvailable()
      val m = s.sql("SELECT window.start, n, sv FROM slidewin").collect()
        .map(r => r.getTimestamp(0).toString -> (r.getLong(1), r.getDouble(2))).toMap
      // 10:07 → windows starting 10:00 and 10:05; 10:12 → 10:05 and 10:10
      assert(m("2024-01-01 10:00:00.0") == (1L, 1.0))
      assert(m("2024-01-01 10:05:00.0") == (2L, 11.0))
      assert(m("2024-01-01 10:10:00.0") == (1L, 10.0))
    } finally q.stop()
  }

  test("session window: gap-separated events form separate sessions; watermark closes them") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(Timestamp, String)](s)
    val agg = EventTime.session(input.toDF().toDF("ts", "user"),
      "ts", gap = "5 minutes", watermarkDelay = Some("10 minutes"), keys = Seq("user"))
      .agg(count(lit(1)).as("n"))
    // append mode: a session row is emitted only once its window is
    // closed by the watermark — exactly-once session emission
    val q = agg.writeStream.format("memory").queryName("sesswin")
      .outputMode("append").trigger(Trigger.ProcessingTime(0L)).start()
    try {
      // session 1: 10:00-10:02 (3 events); gap > 5min; session 2: 10:15
      input.addData(Seq((t(0), "u1"), (t(1), "u1"), (t(2), "u1"), (t(15), "u1")))
      q.processAllAvailable()
      // advance watermark past session 1's close (10:02+5min gap +10min delay)
      input.addData(Seq((t(40), "u1")))
      q.processAllAvailable()
      val rows = s.sql("SELECT session_window.start, session_window.end, n FROM sesswin")
        .collect().map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString, r.getLong(2)))
      assert(rows.contains(("2024-01-01 10:00:00.0", "2024-01-01 10:07:00.0", 3L)))
      assert(rows.contains(("2024-01-01 10:15:00.0", "2024-01-01 10:20:00.0", 1L)))
    } finally q.stop()
  }
}
