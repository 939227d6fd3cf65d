package graft.domain

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** EP2 full composition: rolling refit -> signals -> portfolio -> stats. */
class Ep2Spec extends SparkSpec {

  test("ep2Portfolio produces PnL bins, picks, and a stats row") {
    // 6 days x 4 tickers; y (future ret) linearly follows oi so refits learn
    val rng = new scala.util.Random(13)
    val rows = for {
      d <- 10 to 15
      t <- Seq("A", "B", "C", "D")
    } yield {
      val oi = rng.nextDouble() * 2 - 1
      Row(t, java.sql.Date.valueOf(s"2024-01-$d"),
        java.sql.Date.valueOf(s"2024-01-$d").getTime * 1000000L,
        oi, 0.01 * oi + rng.nextGaussian() * 0.001)
    }
    val panel = df(
      "ticker STRING, date DATE, bin_ns BIGINT, oi DOUBLE, fut_ret DOUBLE",
      rows: _*)
    val (pnl, picks, stats) = Pipelines.ep2Portfolio(panel, "fut_ret",
      Seq("oi"), lookback = 3, pct = 0.25)
    // 6 days - 3 lookback = 3 predicted days
    assert(pnl.count() == 3)
    assert(picks.count() > 0)
    val st = stats.collect()(0)
    assert(st.getAs[Double]("n") == 3.0)
    assert(!st.isNullAt(st.fieldIndex("sharpe")))
    // signal tracks oi -> long-short on oi rank should be profitable
    val total = pnl.agg(sum(col("pnl"))).collect()(0).getDouble(0)
    assert(total > 0, s"expected positive PnL, got $total")
  }
}
