package graft.domain

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** EP2 full composition: rolling refit -> signals -> portfolio -> stats. */
class Ep2Spec extends SparkSpec {

  test("EP2 end-to-end from multi-ticker LOBSTER days: raw events -> " +
    "daily vis-OI panel -> rolling refit -> portfolio -> stats") {
    import graft.fixtures.LobsterFixture
    val tickers = Seq("AAA", "BBB", "CCC", "DDD")
    val prepped = tickers.zipWithIndex.map { case (t, i) =>
      LobsterFixture.preppedDays(spark, "2024-01-15", nDays = 8,
          nEvents = 1200, seed = 50 + 100 * i)
        .withColumn("ticker", lit(t))
    }.reduce(_.unionByName(_))
    val featured = Features.addMicrostructure(prepped)
      .withColumn("pred_prob",
        when(col("direction") === -1, 0.0).otherwise(1.0))
    val daily = Oi.panel(featured, 0L, "vis") // deltaNs<=0 -> one day bin
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ticker")).orderBy(col("date"))
    val withRet = daily
      .withColumn("prev_close", lag(col("last_midprice"), 1).over(w))
      .withColumn("ret", log(col("last_midprice") / col("prev_close")))
      .withColumn("fut_ret", lead(col("ret"), 1).over(w))
      .filter(col("fut_ret").isNotNull &&
        col("order_imbalance_vis").isNotNull)
    // every ticker contributes a full daily series: 8 days, fut_ret
    // defined through day 7 (the regression needs only y=fut_ret and the
    // OI regressor, so day 1's null trailing ret does not drop it)
    assert(withRet.groupBy("ticker").count().collect()
      .forall(_.getLong(1) == 7L))
    val (pnl, picks, stats) = Pipelines.ep2Portfolio(withRet, "fut_ret",
      Seq("order_imbalance_vis"), lookback = 3, pct = 0.25)
    assert(pnl.count() >= 2, "at least lookback-trimmed predicted days")
    assert(picks.count() > 0)
    assert(picks.select("ticker").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(tickers.toSet))
    val st = stats.collect()(0)
    assert(!st.isNullAt(st.fieldIndex("sharpe")))
    val totalPnl = st.getAs[Double]("total_pnl")
    assert(!totalPnl.isNaN && !totalPnl.isInfinite)
  }

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
