package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Structured Streaming operators driven end-to-end through MemoryStream →
  * memory sink (the unit-testable `readStream → transform → writeStream`
  * shape).
  */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed counts with watermark aggregate per tumbling window") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val out = StreamOps.windowedCounts(df, "ts", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), "click", 1.0),
        (ts("2024-01-01 00:02:00"), "click", 2.0),
        (ts("2024-01-01 00:11:00"), "view", 3.0))
      q.processAllAvailable()
      // advance the watermark far enough to close both windows
      input.addData((ts("2024-01-01 01:00:00"), "late", 0.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("window_start", "event_type", "cnt", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows.contains((ts("2024-01-01 00:00:00"), "click", 2L, 3.0)))
      assert(rows.contains((ts("2024-01-01 00:10:00"), "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated keys within the watermark") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "k")
    val out = StreamOps.streamingDedup(df, "ts", Seq("k"), "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), "a"),
        (ts("2024-01-01 00:02:00"), "a"),
        (ts("2024-01-01 00:03:00"), "b"))
      q.processAllAvailable()
      val ks = spark.table("dedup_out").select("k").as[String].collect().sorted
      assert(ks.toSeq == Seq("a", "b"))
    } finally q.stop()
  }

  test("sessionization groups events by gap and emits completed sessions") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[StreamOps.Event]
    val out = StreamOps.sessionize(input.toDS(), gapMs = 60000L) // 1-minute gap
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // two sessions for user 1 (gap of 10 minutes between them); the
      // first completes data-driven when the third event arrives.
      // NOTE: processAllAvailable() never quiesces here — the registered
      // ProcessingTimeTimeout re-arms a wake-up every micro-batch — so
      // poll the sink with a deadline instead.
      input.addData(
        StreamOps.Event(1L, ts("2024-01-01 00:00:00"), "a", 1.0),
        StreamOps.Event(1L, ts("2024-01-01 00:00:30"), "b", 2.0),
        StreamOps.Event(1L, ts("2024-01-01 00:10:00"), "c", 5.0))
      val deadline = System.currentTimeMillis() + 90000
      while (spark.table("sessions").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      val sessions = spark.table("sessions").as[StreamOps.Session].collect()
      // the first session (2 events, gap exceeded by the third) is emitted
      assert(sessions.exists(s => s.userId == 1L && s.nEvents == 2 && s.sumValue == 3.0))
    } finally q.stop()
  }
}
