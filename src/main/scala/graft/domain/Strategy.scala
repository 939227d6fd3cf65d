package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Stats
import graft.operators.Regression

/** Trading-strategy operators (SURVEY §2.9 M8/M10-M12, §2.8 F8/F9;
  * `/root/reference/trading_strategy.py`).
  *
  * The reference recomputes the OI panel from raw archives for every
  * strategy day (`trading_strategy.py:192-207`) — its dominant cost. Here
  * the panel is computed once and strategies run off it (SURVEY §7.4.7):
  * rolling refits become per-day OLS fits over panel slices, and the
  * cross-sectional ranking is ONE window shuffle on the bin key.
  */
object Strategy {

  /** F8: signal = intercept + sum(beta_i * x_i) from a per-(ticker,
    * timeframe) coefficients row (broadcast join; `trading_strategy.py:
    * 44-57`). `betas` maps regressor column -> coefficient column. */
  def linearSignal(panel: DataFrame, params: DataFrame,
                   betas: Map[String, String],
                   interceptCol: String = "intercept"): DataFrame = {
    val joined = panel.join(broadcast(params), Seq("ticker"), "left")
    val combo = betas.foldLeft(col(interceptCol)) {
      case (acc, (x, b)) => acc + coalesce(col(x), lit(0.0)) * col(b)
    }
    joined.withColumn("signal", combo)
  }

  /** W4 + M11: per-bin cross-sectional rank (method='first' semantics =
    * row_number), top/bottom p%, sign agreement, long-short PnL on the
    * future return (`trading_strategy.py:63-104`, `347-464`).
    * Returns (per-bin PnL table, per-(bin,ticker) picks table). */
  def portfolio(signals: DataFrame, pct: Double,
                retCol: String = "fut_log_ret")
      : (DataFrame, DataFrame) = {
    val byBin = Window.partitionBy(col("bin_ns"))
    val rk = Window.partitionBy(col("bin_ns"))
      .orderBy(col("signal").desc, col("ticker"))
    val ranked = signals
      .withColumn("rk", row_number().over(rk).cast("long"))
      .withColumn("n", count(lit(1)).over(byBin).cast("long"))
      .withColumn("k", greatest(floor(col("n") * pct), lit(1L)))
      // sign agreement: top picks need signal > 0, bottom < 0
      .withColumn("is_top", col("rk") <= col("k") && col("signal") > 0)
      .withColumn("is_bottom",
        col("rk") > col("n") - col("k") && col("signal") < 0)
    val picks = ranked.filter(col("is_top") || col("is_bottom"))
      .withColumn("side", when(col("is_top"), 1).otherwise(-1))
      .select(col("bin_ns"), col("ticker"), col("signal"), col("rk"),
        col("side"), col(retCol).as("fut_ret"))
    val pnl = ranked.groupBy(col("bin_ns")).agg(
      sum(when(col("is_top"), col(retCol)).otherwise(0.0)).as("top_pnl"),
      sum(when(col("is_bottom"), col(retCol)).otherwise(0.0)).as("bottom_pnl"),
      sum(when(col("is_top"), 1L).otherwise(0L)).as("n_top"),
      sum(when(col("is_bottom"), 1L).otherwise(0L)).as("n_bottom"))
      .withColumn("pnl", col("top_pnl") - col("bottom_pnl"))
    (pnl, picks)
  }

  /** F9 PnL variants over a signal/return frame: unweighted threshold,
    * |signal|-weighted, sign-based (`trading_strategy.py:313-324`;
    * `ClOp_analysis.ipynb` cell 5). */
  def pnlColumns(signal: Column, ret: Column,
                 thresholdPos: Double = 0.0, thresholdNeg: Double = 0.0)
      : Seq[Column] = Seq(
    (sum(when(signal > thresholdPos, ret).otherwise(0.0)) -
      sum(when(signal < thresholdNeg, ret).otherwise(0.0))).as("pnl_thresh"),
    sum(signum(signal) * ret).as("pnl_sign"),
    sum(signal * ret).as("pnl_weighted"))

  /** M8: rolling per-day refit — for each session d, fit OLS of `y` on
    * `xs` over the previous `lookback` sessions of the panel and predict
    * day d's rows => signal. Driver loops over days (small count), each
    * fit is one distributed agg (`trading_strategy.py:138-245`). */
  def rollingRefitSignals(panel: DataFrame, y: String, xs: Seq[String],
                          lookback: Int): DataFrame = {
    val spark = panel.sparkSession
    import spark.implicits._
    val days = panel.select(col("date")).distinct()
      .orderBy(col("date")).as[java.sql.Date].collect()
    val frames = days.zipWithIndex.drop(lookback).map { case (d, i) =>
      val trainDays = days.slice(i - lookback, i)
      val train = panel.filter(col("date").isin(trainDays.map(_.toString): _*))
      val fit = Regression.olsByGroup(train, y, xs, Nil).head
      val combo = xs.zip(fit.coefs).foldLeft(lit(fit.intercept)) {
        case (acc, (x, b)) => acc + coalesce(col(x), lit(0.0)) * lit(b)
      }
      panel.filter(col("date") === lit(d.toString)).withColumn("signal", combo)
    }
    frames.reduce(_ unionByName _)
  }

  /** M10: Sharpe test over a daily PnL series per group + M12 PPT. */
  def strategyStats(dailyPnl: DataFrame, groupCols: Seq[String],
                    pnlCol: String = "pnl"): DataFrame = {
    val aggs = Stats.sharpeColumns(col(pnlCol)) :+
      sum(col(pnlCol)).as("total_pnl")
    val base =
      if (groupCols.isEmpty) dailyPnl.agg(aggs.head, aggs.tail: _*)
      else dailyPnl.groupBy(groupCols.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
    base.withColumn("p_value",
      Stats.pValueTwoSided(col("sharpe_tstat")))
  }

  /** M12: bet-size-normalized PnL — PnL / (0.1% of median daily dollar
    * volume) per ticker (`portfolio_strategy_statistics.ipynb` 21-25). */
  def betSizedPnl(pnlByTicker: DataFrame, dailyBars: DataFrame)
      : DataFrame = {
    val vol = dailyBars
      .withColumn("dollar_vol", col("close") * col("volume"))
      .groupBy(col("ticker"))
      .agg(expr("percentile(dollar_vol, 0.5)").as("med_dollar_vol"))
    pnlByTicker.join(broadcast(vol), Seq("ticker"), "left")
      .withColumn("ppd",
        col("pnl") / (col("med_dollar_vol") * lit(0.001)))
  }
}
