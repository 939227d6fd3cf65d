package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.SparkSpec

/** Streaming-state soak (r17): SoakSpec guards the BATCH session against
  * checkpoint-block accumulation; this is the same discipline for the
  * STREAMING state stores. The q_stream_* family holds
  * dropDuplicatesWithinWatermark digests and flatMapGroupsWithState
  * pending lists across micro-batches, with eviction driven by the
  * watermark — logic nothing else soaks: a broken eviction path stays
  * green on 2-batch functional tests and only surfaces as unbounded
  * state on a long stream.
  *
  * Method: replay MANY micro-batches of never-duplicated /
  * never-resolved keys with advancing event time and read
  * `StateOperatorProgress.numRowsTotal` (the store's own row count —
  * no timing, deterministic). With the production watermark the count
  * must PLATEAU at a few batches' worth of keys; the
  * deliberately-broken eviction twin (a watermark so large it never
  * passes any event) must GROW with stream length — proving the metric
  * bites, the same in-both-directions structure as SoakSpec. */
class StreamingStateSoakSpec extends SparkSpec {

  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)
  private val ns = 1000000L // 1 ms in ns

  /** Latest progress line that actually carries state-operator totals
    * (processAllAvailable can end on a no-data tick without one). */
  private def stateRows(q: StreamingQuery): Long =
    q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum)
      .getOrElse(0L)

  /** Drive `batches` micro-batches of `perBatch` fresh digests, 60 s of
    * event time apart, through firstCopy at `watermark`; returns the
    * state-store row count after an early batch and after the last. */
  private def dedupSoak(watermark: String,
                        batches: Int, perBatch: Int): (Long, Long) = {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = StreamingDedup.firstCopy(
      input.toDF().toDF("event_time", "text"), "text",
      timeCol = "event_time", watermark = watermark)
    val name = s"soak_dedup_${StreamingOi.nextSinkId()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      var early = 0L
      (1 to batches).foreach { b =>
        input.addData((1 to perBatch).map(i =>
          (ts(b * 60000L), s"doc_${b}_$i")): _*)
        q.processAllAvailable()
        if (b == 2) early = stateRows(q)
      }
      (early, stateRows(q))
    } finally q.stop()
  }

  test("firstCopy state plateaus under the watermark horizon; the " +
    "never-passing-watermark twin grows with stream length") {
    val batches = 6
    val perBatch = 40
    val (early, late) = dedupSoak("30 seconds", batches, perBatch)
    // horizon 30 s < the 60 s batch gap: at most ~2 batches of digests
    // can be live (current + the one the lagging watermark hasn't
    // evicted yet); a margin batch absorbs store bookkeeping
    assert(late <= 3L * perBatch,
      s"dedup state grew to $late rows over $batches batches of " +
        s"$perBatch — watermark eviction not reclaiming digests")
    assert(late <= early + perBatch,
      s"state still growing late in the stream: batch2=$early last=$late")
    // the broken-eviction twin MUST trip the same metric, or the
    // plateau assertion above proves nothing
    val (_, broken) = dedupSoak("9999 hours", batches, perBatch)
    assert(broken >= (batches - 1).toLong * perBatch,
      s"broken-eviction twin read $broken rows — the soak metric " +
        "would not catch a real eviction regression")
  }

  /** Drive `batches` micro-batches of `perBatch` never-resolved type-4
    * execs on fresh (ticker, price) keys through tagStream. */
  private def icebergSoak(watermark: String,
                          batches: Int, perBatch: Int): (Long, Long) = {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Long, Long, Int)]
    val out = StreamingIceberg.tagStream(
      input.toDF().toDF("event_time", "event_id", "ticker", "price",
        "ts_ns", "event_type"),
      toleranceNs = 1 * ns, watermark = watermark)
    val name = s"soak_ice_${StreamingOi.nextSinkId()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      var early = 0L
      (1 to batches).foreach { b =>
        val t = b * 60000L
        input.addData((1 to perBatch).map(i =>
          (ts(t), (b * 1000 + i).toLong, s"T${b}_$i", 100L, t * ns, 4)): _*)
        q.processAllAvailable()
        if (b == 2) early = stateRows(q)
      }
      val late = stateRows(q)
      // expired execs must have been EMITTED as iceberg=0, not dropped
      // with their state (eviction that loses output is worse than none)
      val emitted = spark.sql(s"SELECT COUNT(*) FROM $name")
        .head().getLong(0)
      assert(watermark.contains("hours") ||
        emitted >= (batches - 2).toLong * perBatch,
        s"only $emitted iceberg=0 rows emitted for evicted pending execs")
      (early, late)
    } finally q.stop()
  }

  test("runningOi state is EXACTLY key cardinality — flat in batch count " +
    "and event volume, stepping only when new keys arrive") {
    // the third stateful shape: NoTimeout mapGroupsWithState, whose
    // documented bound is per-KEY state (one TickerState per ticker) —
    // the soak pins that events-per-key and batch count never leak
    // into the store, and that the metric still moves when keys do
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Int, Double)]
    val out = StreamingOi.runningOi(
      input.toDF().toDF("ticker", "direction", "size"))
    val name = s"soak_oi_${StreamingOi.nextSinkId()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      val k = 25
      (1 to 6).foreach { b =>
        // volume grows with b; the key set does not
        input.addData((1 to k * b).map(i =>
          (s"T${i % k}", if (i % 2 == 0) -1 else 1, 1.0 + i)): _*)
        q.processAllAvailable()
        assert(stateRows(q) == k.toLong,
          s"batch $b: state ${stateRows(q)} != key cardinality $k")
      }
      // new keys step the store by exactly their count
      input.addData((1 to 7).map(i => (s"NEW$i", 1, 1.0)): _*)
      q.processAllAvailable()
      assert(stateRows(q) == (k + 7).toLong,
        s"state ${stateRows(q)} after 7 new keys (expected ${k + 7})")
    } finally q.stop()
  }

  test("tagStream pending-exec state plateaus once the watermark passes " +
    "tolerance windows; the never-passing twin accumulates every key") {
    val batches = 6
    val perBatch = 30
    val (early, late) = icebergSoak("1 second", batches, perBatch)
    assert(late <= 3L * perBatch,
      s"pending-exec state grew to $late keys over $batches batches of " +
        s"$perBatch — event-time timeout/eviction not firing")
    assert(late <= early + perBatch,
      s"state still growing late in the stream: batch2=$early last=$late")
    val (_, broken) = icebergSoak("9999 hours", batches, perBatch)
    assert(broken >= (batches - 1).toLong * perBatch,
      s"broken-eviction twin read $broken keys — the soak metric " +
        "would not catch a real eviction regression")
  }
}
