package graft.domain

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.fixtures.LobsterFixture

class OiSpec extends SparkSpec {

  private lazy val day = Features.addMicrostructure(
    LobsterFixture.preppedDay(spark))
    .withColumn("pred_prob",
      when(col("direction") === -1, 0.25).otherwise(0.75))
    .cache()

  private val M5 = 5L * 60 * 1000000000L

  test("iceberg tag: boundary triplet — 0.5ms and exactly-1ms tagged, 1.2ms not") {
    val tagged = Oi.tagIcebergs(LobsterFixture.preppedDay(spark))
    val base = 11 * 3600.0
    val at11 = tagged.filter(col("time_s").isin(base, base + 10.0,
        base + 20.0))
      .orderBy(col("seq")).select(col("iceberg")).collect()
      .map(_.getInt(0))
    assert(at11.sameElements(Array(1, 1, 0)),
      s"expected [1,1,0] got [${at11.mkString(",")}]")
  }

  test("vis panel: OI in [-1,1], first/last midprice ordered by seq") {
    val p = Oi.panel(day, M5, "vis")
    val ois = p.select(col("order_imbalance_vis")).collect()
      .filterNot(_.isNullAt(0)).map(_.getDouble(0))
    assert(ois.nonEmpty)
    assert(ois.forall(v => v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12))
    // cross-check one bin by hand
    val bin = p.orderBy(col("bin_ns")).limit(1).collect()(0)
    val binNs = bin.getLong(2)
    val evs = day.filter(col("event_type") === 4)
      .withColumn("b", Oi.binNs(M5)).filter(col("b") === binNs)
      .orderBy(col("seq"))
      .select(col("direction"), col("size").cast("double"), col("midprice"))
      .collect()
    val buy = evs.filter(_.getInt(0) == -1).map(_.getDouble(1)).sum
    val sell = evs.filter(_.getInt(0) == 1).map(_.getDouble(1)).sum
    val expect = (buy - sell) / (buy + sell)
    assertApprox(bin.getAs[Double]("order_imbalance_vis"), expect, 1e-9)
    assertApprox(bin.getAs[Double]("first_midprice"),
      evs.head.getDouble(2), 1e-9)
    assertApprox(bin.getAs[Double]("last_midprice"),
      evs.last.getDouble(2), 1e-9)
  }

  test("hid panel: weighted OI matches direct computation") {
    val p = Oi.panel(day, M5, "hid")
    val bin = p.filter(col("order_imbalance_hid").isNotNull)
      .orderBy(col("bin_ns")).limit(1).collect()(0)
    val binNs = bin.getLong(2)
    val evs = day.filter(col("event_type") === 5)
      .withColumn("b", Oi.binNs(M5)).filter(col("b") === binNs)
      .select(col("size").cast("double"), col("pred_prob")).collect()
    val num = evs.map(r => r.getDouble(0) * (1 - 2 * r.getDouble(1))).sum
    val den = evs.map(_.getDouble(0)).sum
    assertApprox(bin.getAs[Double]("order_imbalance_hid"), num / den, 1e-9)
  }

  test("all panel forces visible rows to prob 0/1") {
    val p = Oi.panel(day, 0L, "all") // daily: one row
    assert(p.count() == 1)
    val v = p.collect()(0).getAs[Double]("order_imbalance_all")
    assert(v >= -1.0 && v <= 1.0)
  }

  test("size panel: tercile buckets produce three OI columns") {
    val p = Oi.panel(day, 0L, "size").collect()(0)
    Seq("order_imbalance_small", "order_imbalance_medium",
      "order_imbalance_large").foreach { c =>
      val v = p.getAs[Double](c)
      assert(v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12, s"$c = $v")
    }
  }

  test("agg panel: aggressiveness buckets from pred_dir x agg_ratio") {
    val withDir = day.withColumn("pred_dir",
      when(col("direction") === -1, -1).otherwise(1))
    val p = Oi.panel(withDir, 0L, "agg").collect()(0)
    Seq("order_imbalance_agg_low", "order_imbalance_agg_mid",
      "order_imbalance_agg_high").foreach { c =>
      val i = p.fieldIndex(c)
      if (!p.isNullAt(i)) {
        val v = p.getDouble(i)
        assert(v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12, s"$c = $v")
      }
    }
    // fixture engineers hidden execs at bid (ratio 0), inside (0.5), and
    // above ask (>1) — low/mid/high are all populated for some pred_dir
    val withB = Features.addMicrostructure(
      graft.fixtures.LobsterFixture.preppedDay(spark))
      .withColumn("pred_dir", when(col("direction") === -1, -1).otherwise(1))
      .filter(col("event_type") === 5)
    assert(withB.filter(col("agg_ratio") === 0.5).count() > 0)
    assert(withB.filter(col("agg_ratio") < 0.5).count() > 0)
    assert(withB.filter(col("agg_ratio") > 0.5).count() > 0)
  }

  test("densifyPanel: full spine, zero-filled OI, last bin dropped") {
    val p = Oi.densifyPanel(Oi.panel(day, M5, "vis"), M5)
    // session (10:00, 15:30] at 5min = 66 bins, minus the dropped last = 65
    assert(p.count() == 65)
    // the engineered empty (13:00,13:05] bin exists with OI 0
    val emptyBin = LobsterFixture.Day.toLocalDate.toEpochDay *
      86400L * 1000000000L + (47100L * 1000000000L)
    val row = p.filter(col("bin_ns") === emptyBin).collect()
    assert(row.length == 1)
    assert(row(0).getAs[Double]("order_imbalance_vis") == 0.0)
    assert(row(0).isNullAt(row(0).fieldIndex("first_midprice")))
  }

  test("combined joins kinds on the bin key without column clashes") {
    val vis = Oi.densifyPanel(Oi.panel(day, M5, "vis"), M5)
    val hid = Oi.densifyPanel(Oi.panel(day, M5, "hid"), M5)
    val c = Oi.combined(Seq(vis, hid))
    assert(c.count() == 65)
    assert(c.columns.count(_ == "first_midprice") == 1)
    assert(c.columns.contains("order_imbalance_vis") &&
      c.columns.contains("order_imbalance_hid"))
  }

  test("iceberg panel: vis+ib split sums to the type-4 population") {
    val p = Oi.panel(day, 0L, "iceberg").collect()(0)
    val vis = p.getAs[Double]("order_imbalance_vis")
    assert(vis >= -1.0 && vis <= 1.0)
    // _ib may be null (no icebergs beyond the triplet's tagged events)
  }
}
