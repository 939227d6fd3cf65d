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

  test("daily panel across days feeds a ClOp-style regression") {
    val featured = Features.addMicrostructure(days)
      .withColumn("pred_prob", lit(0.5))
    val daily = Oi.panel(featured, 0L, "vis")
    assert(daily.count() == 4)
    val withRet = Returns.addLogReturns(daily)
    // day-level log_ret defined wherever both first/last midprice exist
    assert(withRet.filter(col("log_ret").isNotNull).count() == 4)
  }
}
