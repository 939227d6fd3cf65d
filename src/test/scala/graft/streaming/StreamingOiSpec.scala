package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamingOiSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedOi emits closed windows with correct OI (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Int, Long)]
    val events = input.toDF()
      .toDF("event_time", "ticker", "direction", "size")
    val oi = StreamingOi.windowedOi(events, delta = "5 minutes",
      watermark = "1 minute")
    val q = StreamingOi.startMemorySink(oi, "oi_test")
    try {
      // window [10:00,10:05): buys 30 (dir -1), sells 10 -> OI 0.5
      input.addData(
        (ts("2024-01-15 10:00:10"), "T", -1, 30L),
        (ts("2024-01-15 10:01:00"), "T", 1, 10L))
      q.processAllAvailable()
      // advance watermark past 10:06 to close the first window
      input.addData((ts("2024-01-15 10:07:00"), "T", -1, 5L))
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM oi_test").collect()
      assert(out.length == 1)
      val r = out(0)
      assert(r.getAs[Timestamp]("bin_start") == ts("2024-01-15 10:00:00"))
      assertApprox(r.getAs[Double]("order_imbalance"), 0.5)
      assert(r.getAs[Long]("n_events") == 2L)
    } finally q.stop()
  }

  test("windowedOi late data: inside-watermark stragglers absorbed into " +
    "their open window; past-watermark rows dropped (never resurrect a " +
    "closed window, never corrupt an emitted one)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Int, Long)]
    val events = input.toDF()
      .toDF("event_time", "ticker", "direction", "size")
    val oi = StreamingOi.windowedOi(events, delta = "1 hour",
      watermark = "1 hour")
    val q = StreamingOi.startMemorySink(oi, "oi_late_test")
    try {
      // window A [00:00,01:00): one buy; then 10:00 advances wm to 09:00
      input.addData(
        (ts("2024-01-15 00:10:00"), "T", -1, 10L),
        (ts("2024-01-15 10:00:00"), "T", -1, 1L))
      q.processAllAvailable()
      // late arrivals under wm 09:00: the 09:30 straggler's window
      // [09:00,10:00) is still open -> absorbed; the 00:20 row's window
      // closed long ago -> dropped
      input.addData(
        (ts("2024-01-15 09:30:00"), "T", 1, 4L),
        (ts("2024-01-15 00:20:00"), "T", 1, 99L))
      q.processAllAvailable()
      // push wm past everything so all real windows emit
      input.addData((ts("2024-01-16 12:00:00"), "T", -1, 1L))
      q.processAllAvailable()
      input.addData((ts("2024-01-17 12:00:00"), "T", -1, 1L))
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM oi_late_test").collect()
        .map(r => r.getAs[Timestamp]("bin_start") ->
          (r.getAs[Double]("order_imbalance"), r.getAs[Long]("n_events")))
        .toMap
      // window A: ONLY the on-time buy (a kept 99-sell would flip OI)
      assert(out(ts("2024-01-15 00:00:00")) == ((1.0, 1L)),
        s"closed window corrupted: ${out.mkString("; ")}")
      // window [09:00,10:00): the absorbed late sell -> (0-4)/4 = -1
      assert(out(ts("2024-01-15 09:00:00")) == ((-1.0, 1L)),
        s"straggler not absorbed: ${out.mkString("; ")}")
    } finally q.stop()
  }

  test("replayComplete: finite-replay streaming aggregation == the " +
    "batch aggregation, last (incomplete) bin included") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Int, Long)]
    val events = input.toDF().toDF("bin_ns", "direction", "size")
    val agg = graft.operators.Imbalance.orderImbalance(
      events, Seq(col("bin_ns")), col("direction"), col("size"))
    input.addData((1L, -1, 30L), (1L, 1, 10L), (2L, -1, 5L))
    val got = StreamingOi.replayComplete(
        agg.select(col("bin_ns"), col("order_imbalance")),
        "oi_replay_" + StreamingOi.nextSinkId())
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // bin 1: (30-10)/40 = 0.5; bin 2 (the still-open tail in append
    // terms) must ALSO be present: (5-0)/5 = 1.0
    assert(got == Map(1L -> 0.5, 2L -> 1.0))
  }

  test("windowedOi drops data later than the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Int, Long)]
    val events = input.toDF()
      .toDF("event_time", "ticker", "direction", "size")
    val oi = StreamingOi.windowedOi(events, delta = "5 minutes",
      watermark = "1 minute")
    val q = StreamingOi.startMemorySink(oi, "oi_late")
    try {
      input.addData((ts("2024-01-15 10:00:10"), "T", -1, 30L))
      q.processAllAvailable()
      input.addData((ts("2024-01-15 10:30:00"), "T", 1, 1L))
      q.processAllAvailable()
      // this event is far behind the watermark -> dropped
      input.addData((ts("2024-01-15 10:00:20"), "T", 1, 999L))
      q.processAllAvailable()
      input.addData((ts("2024-01-15 10:40:00"), "T", 1, 1L))
      q.processAllAvailable()
      val first = spark.sql(
        "SELECT order_imbalance FROM oi_late WHERE bin_start = '2024-01-15 10:00:00'")
        .collect()
      assert(first.length == 1)
      assertApprox(first(0).getDouble(0), 1.0) // late 999 not counted
    } finally q.stop()
  }

  test("runningOi accumulates cross-batch state per ticker") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Int, Long)]
    val events = input.toDF()
      .toDF("event_time", "ticker", "direction", "size")
    val running = StreamingOi.runningOi(events)
    val q = running.writeStream.format("memory").queryName("oi_run")
      .outputMode("update").start()
    try {
      input.addData((ts("2024-01-15 10:00:00"), "T", -1, 10L))
      q.processAllAvailable()
      input.addData((ts("2024-01-15 10:01:00"), "T", 1, 10L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT * FROM oi_run ORDER BY buy + sell").collect()
      // second update sees cumulative state: buy 10, sell 10 -> OI 0
      val last = rows.last
      assert(last.getAs[Double]("buy") == 10.0 &&
        last.getAs[Double]("sell") == 10.0)
      assertApprox(last.getAs[Double]("oi"), 0.0)
    } finally q.stop()
  }

  test("session_window merges session state ACROSS micro-batches — the " +
    "q_stream_sessionize mechanism (a session open at batch end must " +
    "absorb the next batch's in-gap events)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("event_time", "user_id")
    val sess = df.groupBy(session_window(col("event_time"), "30 seconds"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"))
    val name = "sess_merge_" + StreamingOi.nextSinkId()
    val q = sess.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      // batch 1 ends with the session still open (last event 10:00:10)
      input.addData((ts("2024-01-15 10:00:00"), 1L),
        (ts("2024-01-15 10:00:10"), 1L))
      q.processAllAvailable()
      // batch 2: 10:00:25 is inside the open session's gap -> must MERGE
      // into it; 10:05:00 is far out -> a second session
      input.addData((ts("2024-01-15 10:00:25"), 1L),
        (ts("2024-01-15 10:05:00"), 1L))
      q.processAllAvailable()
      val got = spark.table(name)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getLong(2))).toSet
      assert(got == Set(
        (1L, "2024-01-15 10:00:00.0", 3L),
        (1L, "2024-01-15 10:05:00.0", 1L)), s"got $got")
    } finally q.stop()
  }
}
