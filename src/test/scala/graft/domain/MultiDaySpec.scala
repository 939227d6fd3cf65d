package graft.domain

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.fixtures.LobsterFixture

/** EP1 across multiple trading days — the panel shape regressions run on. */
class MultiDaySpec extends SparkSpec {

  private lazy val days =
    LobsterFixture.preppedDays(spark, "2024-01-08", nDays = 4).cache()

  test("multi-day panel: one dense bin set per day, returns per day") {
    val (panel, fits) = Pipelines.ep1(days, 15L * 60 * 1000000000L)
    // 4 days x (22 bins - last) = 84
    assert(panel.count() == 84)
    assert(panel.select(col("date")).distinct().count() == 4)
    assert(fits.size == 1) // one ticker
    assert(fits.head.n > 40)
  }

  test("fut_log_ret is null on each day's last kept bin (no overnight " +
    "lookahead; order_imbalance.py:91 per-day shift(-1))") {
    val (panel, _) = Pipelines.ep1(days, 15L * 60 * 1000000000L)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("ticker"), col("date"))
    val lastBins = panel
      .withColumn("__max_bin", max(col("bin_ns")).over(w))
      .filter(col("bin_ns") === col("__max_bin"))
    assert(lastBins.count() == 4)
    assert(lastBins.filter(col("fut_log_ret").isNotNull).count() == 0)
    // and interior bins DO carry a future return (fixture density covers
    // the whole core session, so every successor bin has a defined log_ret)
    val interior = panel
      .withColumn("__max_bin", max(col("bin_ns")).over(w))
      .filter(col("bin_ns") < col("__max_bin"))
    assert(interior.count() == 84 - 4)
    assert(interior.filter(col("fut_log_ret").isNull).count() == 0)
  }

  test("bin before an EMPTY bin has null fut_log_ret (reference semantics: " +
    "order_imbalance.py:91 shift(-1) of a NaN log_ret; the :301 fill " +
    "touches only OI columns, never returns)") {
    // sparse day: ~260 core events at ~9 s mean step exhaust coverage near
    // 10:40, so late 15-min bins are empty after densification
    val sparse = LobsterFixture
      .preppedDays(spark, "2024-02-05", nDays = 1, nEvents = 300)
    val (panel, _) = Pipelines.ep1(sparse, 15L * 60 * 1000000000L)
    val rows = panel.select(col("bin_ns"), col("log_ret"), col("fut_log_ret"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    val emptyBins = rows.filter(_._2.isEmpty)
    assert(emptyBins.nonEmpty, "sparse fixture must produce empty bins")
    // every bin's fut_log_ret IS its successor's log_ret — including None
    // when the successor bin is empty
    rows.sliding(2).foreach {
      case Array((_, _, fut), (_, ret, _)) => assert(fut == ret)
      case _ =>
    }
    assert(rows.exists { case (_, ret, fut) => ret.isDefined && fut.isEmpty })
  }

  test("per-day fut_log_ret differential: equals brute-force next-bin " +
    "log_ret within the day, never the next day's first bin") {
    val (panel, _) = Pipelines.ep1(days, 15L * 60 * 1000000000L)
    val rows = panel.select(col("date").cast("string"), col("bin_ns"),
        col("log_ret"), col("fut_log_ret"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(t => (t._1, t._2))
    val byDay = rows.groupBy(_._1)
    byDay.values.foreach { day =>
      val sorted = day.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, _, fut), (_, _, ret, _)) => assert(fut == ret)
        case _ =>
      }
      assert(sorted.last._4.isEmpty)
    }
  }

  test("daily panel across days feeds a ClOp-style regression; deltaNs<=0 " +
    "picks the per-ticker window so fut_log_ret is the NEXT DAY's return") {
    val featured = Features.addMicrostructure(days)
      .withColumn("pred_prob", lit(0.5))
    val daily = Oi.panel(featured, 0L, "vis")
    assert(daily.count() == 4)
    val withRet = Returns.addLogReturns(daily, deltaNs = 0L)
    // day-level log_ret defined wherever both first/last midprice exist
    assert(withRet.filter(col("log_ret").isNotNull).count() == 4)
    // a daily panel has ONE row per (ticker, date): a per-day lead would
    // null out every fut_log_ret; the threaded deltaNs must pick the
    // per-ticker window so days 1..3 carry the next day's return
    assert(withRet.filter(col("fut_log_ret").isNotNull).count() == 3)
    // and the old default (intraday semantics) on the same frame WOULD
    // have been all-null — the regression ADVICE #2 guarded against
    assert(Returns.addLogReturns(daily)
      .filter(col("fut_log_ret").isNotNull).count() == 0)
  }
}
