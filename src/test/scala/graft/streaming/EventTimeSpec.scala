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

  test("event-time dedup: duplicates within the watermark drop; keys re-emit after it passes") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(String, Timestamp)](s)
    val out = EventTime.dedupWithinWatermark(
      input.toDF().toDF("key", "ts"), Seq("key"), "ts", delay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("wmdedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0L)).start()
    try {
      // k1 arrives at 10:00 and again (redelivery) at 10:03 → one emission
      input.addData(Seq(("k1", t(0)), ("k2", t(1))))
      q.processAllAvailable()
      input.addData(Seq(("k1", t(3))))
      q.processAllAvailable()
      assert(s.table("wmdedup").collect().map(_.getString(0)).sorted.toSeq
        == Seq("k1", "k2"))
      // advance event time far past the watermark: k1's dedup state has
      // expired, so a genuinely NEW k1 occurrence emits again
      input.addData(Seq(("adv", t(40))))
      q.processAllAvailable()
      input.addData(Seq(("k1", t(45))))
      q.processAllAvailable()
      val k1s = s.table("wmdedup").collect().count(_.getString(0) == "k1")
      assert(k1s == 2, s"expired key did not re-emit (k1 rows: $k1s)")
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to impressions within the window") {
    val s = spark
    import s.implicits._
    val impressions = MemoryStream[(Timestamp, Long, String)](s)
    val clicks = MemoryStream[(Timestamp, Long, String)](s)
    val joined = EventTime.intervalJoin(
      impressions.toDF().toDF("imp_ts", "ad", "imp_id"),
      clicks.toDF().toDF("click_ts", "ad", "click_id"),
      key = "ad", leftTs = "imp_ts", rightTs = "click_ts",
      lower = "0 seconds", upper = "10 minutes",
      leftWatermark = "20 minutes", rightWatermark = "20 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").trigger(Trigger.ProcessingTime(0L)).start()
    try {
      impressions.addData(Seq((t(0), 1L, "i1"), (t(0), 2L, "i2")))
      // c1 within 10min of i1; c2 matches ad 2; c3 too late for i1
      clicks.addData(Seq((t(5), 1L, "c1"), (t(9), 2L, "c2"), (t(20), 1L, "c3")))
      q.processAllAvailable()
      val pairs = s.sql("SELECT imp_id, click_id FROM attrib")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(pairs == Set(("i1", "c1"), ("i2", "c2")), s"got $pairs")
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
