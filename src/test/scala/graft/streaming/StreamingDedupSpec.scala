package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Sampling

class StreamingDedupSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("firstCopy: first arrival wins, in-horizon duplicates dropped, " +
    "cross-batch state retained") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("event_time", "doc_id", "text")
    val out = StreamingDedup.firstCopy(docs, "text",
      watermark = "10 minutes")
    val q = StreamingOi.startMemorySink(out, "dedup_test")
    try {
      input.addData(
        (ts("2024-01-15 10:00:00"), 1L, "alpha"),
        (ts("2024-01-15 10:00:30"), 2L, "beta"),
        (ts("2024-01-15 10:01:00"), 3L, "alpha")) // dup, same batch
      q.processAllAvailable()
      input.addData(
        (ts("2024-01-15 10:02:00"), 4L, "beta"),  // dup, later batch
        (ts("2024-01-15 10:02:30"), 5L, "gamma"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dedup_test").collect()
        .map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 5L))
    } finally q.stop()
  }

  test("replayAppend: finite-replay first-copy dedup == batch DISTINCT " +
    "on the content surface (digest, length)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    input.addData(
      (ts("2024-01-15 10:00:00"), 1L, "alpha"),
      (ts("2024-01-15 10:00:10"), 2L, "beta"),
      (ts("2024-01-15 10:00:20"), 3L, "alpha"),
      (ts("2024-01-15 10:00:30"), 4L, "gamma"),
      (ts("2024-01-15 10:00:40"), 5L, "beta"))
    val docs = input.toDF().toDF("event_time", "doc_id", "text")
    val kept = StreamingDedup.firstCopy(docs, "text")
      .select(md5(col("text")).as("digest"),
        length(col("text")).cast("long").as("text_len"))
    val got = StreamingOi.replayAppend(kept, "replay_append_dedup")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = Seq("alpha", "beta", "gamma").toDF("text")
      .select(md5(col("text")), length(col("text")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("sampleStream: the batch Bernoulli sampler verbatim — streamed " +
    "selection equals the batch selection on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val docs = input.toDF().toDF("event_time", "doc_id")
    val out = StreamingDedup.sampleStream(docs, "doc_id", 0.3, seed = 9L)
    val q = StreamingOi.startMemorySink(out, "sample_test")
    try {
      val rows = (1 to 500).map(i => (ts("2024-01-15 10:00:00"), i.toLong))
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM sample_test").collect()
        .map(_.getLong(0)).toSet
      val batch = Sampling.bernoulliSample(
          rows.toDF("event_time", "doc_id"), "doc_id", 0.3, seed = 9L)
        .collect().map(_.getLong(1)).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty && streamed.size < 500)
    } finally q.stop()
  }
}
