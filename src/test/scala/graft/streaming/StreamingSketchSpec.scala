package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Sketches

/** The sketch aggregations run ON the streaming engine: HLL registers
  * are a max-rho groupBy (algebraic, set-semantics — insensitive to
  * batching), CMS cells a sum groupBy. Both must equal the batch sketch
  * over the union of all micro-batches, which is what makes a streaming
  * distinct-users / frequency dashboard trustworthy against its batch
  * backfill. */
class StreamingSketchSpec extends SparkSpec {

  import spark.implicits._

  test("streaming HLL registers across micro-batches == batch sketch " +
    "on the union (duplicates across batches change nothing)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val keys = input.toDF().toDF("k")
    val regs = Sketches.hllSketch(keys, Nil, "k", p = 6, seed = 1L)
    val q = regs.writeStream.format("memory").queryName("stream_hll_regs")
      .outputMode("complete").start()
    try {
      input.addData(1L to 500L: _*)
      q.processAllAvailable()
      input.addData(300L to 900L: _*)   // overlap: dups must be no-ops
      q.processAllAvailable()
      val streamed = spark.table("stream_hll_regs")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = Sketches.hllSketch(
          spark.range(1, 901).select(col("id").as("k")), Nil, "k",
          p = 6, seed = 1L)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming HLL estimate from replayed registers tracks the " +
    "distinct count") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    input.addData(1L to 2000L: _*)
    input.addData(1L to 2000L: _*)    // a full duplicate epoch
    val regs = Sketches.hllSketch(input.toDF().toDF("k"), Nil, "k",
      p = 10, seed = 0L)
    val est = Sketches.hllEstimate(
        StreamingOi.replayComplete(regs, "stream_hll_est"), Nil)
      .collect().head.getDouble(0)
    assert(math.abs(est - 2000) / 2000.0 < 0.08, s"est=$est")
  }

  test("streaming fixed-range histogram cells across micro-batches == " +
    "batch cells on the union (the n-less one-pass sketch face)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Double]
    val cells = Sketches.histogramSketchFixed(input.toDF().toDF("v"),
      Nil, "v", lo = 0.0, hi = 100.0, buckets = 10)
    val q = cells.writeStream.format("memory").queryName("stream_hist")
      .outputMode("complete").start()
    try {
      input.addData((1 to 50).map(_.toDouble): _*)
      q.processAllAvailable()
      input.addData((30 to 99).map(_.toDouble): _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_hist")
        .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
      val union = ((1 to 50) ++ (30 to 99)).map(_.toDouble).toDF("v")
      val batch = Sketches.histogramSketchFixed(union, Nil, "v",
          0.0, 100.0, 10)
        .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming CMS cells across micro-batches == batch cells on the " +
    "union (counts add)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val cells = Sketches.cmsSketch(input.toDF().toDF("k"), "k",
      depth = 3, width = 32, seed = 2L)
    val q = cells.writeStream.format("memory").queryName("stream_cms_cells")
      .outputMode("complete").start()
    try {
      input.addData(Seq.fill(50)(7L) ++ (1L to 20L): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(30)(7L) ++ (10L to 40L): _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_cms_cells")
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
        .toMap
      val union = (Seq.fill(50)(7L) ++ (1L to 20L) ++
        Seq.fill(30)(7L) ++ (10L to 40L)).toDF("k")
      val batch = Sketches.cmsSketch(union, "k", depth = 3, width = 32,
          seed = 2L)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
        .toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
