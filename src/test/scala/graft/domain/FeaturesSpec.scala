package graft.domain

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** W2/W3/P8 feature semantics on a hand-built event sequence. */
class FeaturesSpec extends SparkSpec {

  // tiny ordered day: seq 0..5, one ticker
  private def mk() = df(
    "ticker STRING, date DATE, seq BIGINT, event_time TIMESTAMP, " +
      "event_type INT, direction INT, size BIGINT, price BIGINT, " +
      "ask_price_1 BIGINT, ask_size_1 BIGINT, bid_price_1 BIGINT, bid_size_1 BIGINT",
    Row("T", java.sql.Date.valueOf("2024-01-15"), 0L,
      java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), 1, 1, 10L, 990L,
      1010L, 100L, 990L, 100L),
    Row("T", java.sql.Date.valueOf("2024-01-15"), 1L,
      java.sql.Timestamp.valueOf("2024-01-15 10:00:01"), 4, -1, 20L, 1010L,
      1010L, 100L, 990L, 100L),
    Row("T", java.sql.Date.valueOf("2024-01-15"), 2L,
      java.sql.Timestamp.valueOf("2024-01-15 10:00:02"), 5, -1, 30L, 1000L,
      1010L, 100L, 990L, 100L),
    Row("T", java.sql.Date.valueOf("2024-01-15"), 3L,
      java.sql.Timestamp.valueOf("2024-01-15 10:00:03"), 3, 1, 40L, 990L,
      1010L, 100L, 990L, 100L),
    Row("T", java.sql.Date.valueOf("2024-01-15"), 4L,
      java.sql.Timestamp.valueOf("2024-01-15 10:00:04"), 1, -1, 50L, 1020L,
      1020L, 100L, 990L, 100L),
    Row("T", java.sql.Date.valueOf("2024-01-15"), 5L,
      java.sql.Timestamp.valueOf("2024-01-15 10:00:05"), 5, 1, 60L, 1020L,
      1020L, 100L, 990L, 100L))

  test("W2 adjacent directions: prev is strictly before, next strictly after") {
    val out = Features.addAdjacentDirections(mk(), Seq(1))
      .orderBy(col("seq"))
      .select(col("prev_dir_1"), col("next_dir_1")).collect()
    // type-1 events at seq 0 (dir 1) and seq 4 (dir -1)
    assert(out.map(_.getInt(0)).sameElements(Array(0, 1, 1, 1, 1, -1)))
    assert(out.map(_.getInt(1)).sameElements(Array(-1, -1, -1, -1, 0, 0)))
  }

  test("W3 sentiment: signed-size rolling sums incl current, 5-window") {
    // signed: seq0 +10 (t1), seq1 -20 (t4 dir-1: -1*20... np.select: type 4
    // => dir*size = -20), seq2 0 (t5), seq3 -40 (t3: -dir*size), seq4 -50,
    // seq5 0
    val out = Features.addSentiment(mk(), window = 3)
      .orderBy(col("seq"))
      .select(col("sent_prev"), col("sent_next")).collect()
    val prev = out.map(_.getLong(0))
    val next = out.map(_.getLong(1))
    // rowsBetween(-2,0) sums of [10,-20,0,-40,-50,0]
    assert(prev.sameElements(Array(10L, -10L, -10L, -60L, -90L, -90L)))
    // rowsBetween(0,2)
    assert(next.sameElements(Array(-10L, -60L, -90L, -90L, -50L, 0L)))
  }

  test("P8 outside-spread tag overrides pred columns") {
    val withMicro = Features.addMicrostructure(mk())
      .withColumn("pred_dir", lit(0))
      .withColumn("pred_prob", lit(0.5))
    val out = Features.applyOutsideSpreadTag(withMicro)
      .filter(col("event_type") === 5).orderBy(col("seq"))
      .select(col("agg_ratio"), col("pred_dir"), col("pred_prob")).collect()
    // seq2: price 1000 in (990,1010) -> agg_ratio 0.5, untouched
    assertApprox(out(0).getDouble(0), 0.5)
    assert(out(0).getInt(1) == 0 && out(0).getDouble(2) == 0.5)
    // seq5: price 1020 == ask (spread 990-1020) -> agg_ratio 1 -> sell tag
    assert(out(1).getDouble(0) >= 1.0)
    assert(out(1).getInt(1) == 1 && out(1).getDouble(2) == 1.0)
  }

  test("hiddenExecFeatures returns only type-5 rows with feature columns") {
    val out = Features.hiddenExecFeatures(mk())
    assert(out.select(col("event_type")).distinct().collect()
      .map(_.getInt(0)).sameElements(Array(5)))
    val cols = out.columns.toSet
    assert(Seq("midprice", "ofi", "agg_ratio", "sent_prev", "sent_next",
      "prev_dir_1", "next_dir_4").forall(cols.contains))
  }
}
