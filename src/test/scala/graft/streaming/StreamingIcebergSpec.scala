package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamingIcebergSpec extends SparkSpec {

  import spark.implicits._

  // (event_time, event_id, ticker, price, ts_ns, event_type)
  private type Ev = (Timestamp, Long, String, Long, Long, Int)

  private def ts(ms: Long) = new Timestamp(ms)
  private val ns = 1000000L // 1 ms in ns

  private def start(input: MemoryStream[Ev], tolNs: Long) = {
    val df = input.toDF().toDF("event_time", "event_id", "ticker",
      "price", "ts_ns", "event_type")
    StreamingIceberg.tagStream(df, tolNs, watermark = "1 second")
      .writeStream.format("memory").queryName("ice_out")
      .outputMode("append").start()
  }

  private def results(): Map[Long, Int] =
    spark.sql("SELECT execId, iceberg FROM ice_out").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("submit within tolerance tags the exec; late submit does not") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = start(input, tolNs = 1 * ns)
    try {
      // exec at t=1000ms; submit at +0.5ms (same key) => iceberg 1
      input.addData(
        (ts(1000), 1L, "X", 100L, 1000L * ns, 4),
        (ts(1001), 2L, "X", 100L, 1000L * ns + ns / 2, 1))
      q.processAllAvailable()
      // exec at 2000ms with submit 2ms later (outside tol) => resolved 0
      // as soon as the late submit arrives
      input.addData(
        (ts(2000), 3L, "X", 200L, 2000L * ns, 4),
        (ts(2002), 4L, "X", 200L, 2002L * ns, 1))
      q.processAllAvailable()
      val r = results()
      assert(r.get(1L).contains(1), s"got $r")
      assert(r.get(3L).contains(0), s"got $r")
    } finally q.stop()
  }

  test("exec with no submit expires to iceberg=0 after watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = start(input, tolNs = 1 * ns)
    try {
      input.addData((ts(1000), 10L, "Y", 100L, 1000L * ns, 4))
      q.processAllAvailable()
      assert(results().isEmpty) // still pending
      // advance watermark far beyond 1000ms + tol + 1s watermark delay
      input.addData((ts(60000), 11L, "Y", 999L, 60000L * ns, 4))
      q.processAllAvailable()
      input.addData((ts(120000), 12L, "Y", 998L, 120000L * ns, 4))
      q.processAllAvailable()
      val r = results()
      assert(r.get(10L).contains(0), s"got $r")
    } finally q.stop()
  }

  test("exactly-at-tolerance submit matches (inclusive, pandas parity)") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = start(input, tolNs = 1 * ns)
    try {
      input.addData(
        (ts(1000), 20L, "Z", 100L, 1000L * ns, 4),
        (ts(1001), 21L, "Z", 100L, 1000L * ns + ns, 1)) // exactly 1ms
      q.processAllAvailable()
      assert(results().get(20L).contains(1))
    } finally q.stop()
  }

  test("same-instant submit matches: type 4 processes before type 1 at " +
    "equal timestamps (inclusive forward window, batch as-of parity) — " +
    "even when the submit's event_id sorts first") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = start(input, tolNs = 1 * ns)
    try {
      // submit event_id 40 < exec event_id 41, identical ts: an
      // (ts, execId) sort would process the submit first and miss
      input.addData(
        (ts(1000), 40L, "V", 100L, 1000L * ns, 1),
        (ts(1000), 41L, "V", 100L, 1000L * ns, 4))
      q.processAllAvailable()
      assert(results().get(41L).contains(1), s"got ${results()}")
    } finally q.stop()
  }

  test("keys are independent: submit at a different price does not match") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = start(input, tolNs = 1 * ns)
    try {
      input.addData(
        (ts(1000), 30L, "W", 100L, 1000L * ns, 4),
        (ts(1001), 31L, "W", 200L, 1000L * ns + ns / 2, 1))
      q.processAllAvailable()
      input.addData((ts(90000), 32L, "W", 999L, 90000L * ns, 4))
      q.processAllAvailable()
      input.addData((ts(180000), 33L, "W", 998L, 180000L * ns, 4))
      q.processAllAvailable()
      assert(results().get(30L).contains(0))
    } finally q.stop()
  }
}
