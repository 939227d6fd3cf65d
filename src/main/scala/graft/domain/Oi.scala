package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Schema.EventType
import graft.operators.{AsOfJoin, Imbalance, TimeBins}

/** The binned order-imbalance panel family (SURVEY §2.4 A1-A5 + §2.5 W7 +
  * §2.3 J3/J5), the reference's core analytic
  * (`/root/reference/order_imbalance.py:242-475`).
  *
  * `kind`:
  *  - `vis`      A1 over visible executions (type 4)
  *  - `hid`      A2 probability-weighted over hidden executions (type 5)
  *  - `all`      A2 over types 4+5 with visible rows forced to prob 0/1
  *               (`order_imbalance.py:290-291`)
  *  - `iceberg`  A3 vis-OI split by the iceberg tag (J3 as-of self-join)
  *  - `size`     A4 tercile-conditional weighted OI over hidden execs
  *               (strict < q1 / [q1,q2] / > q2, `order_imbalance.py:436-448`)
  *  - `agg`      A4 aggressiveness-conditional weighted OI: buckets from
  *               pred_dir x agg_ratio vs 0.5 (`order_imbalance.py:419-432`)
  *
  * Execution shape at scale: one as-of window shuffle on (ticker, price)
  * [iceberg only], then ONE groupBy shuffle on (ticker, date, bin). The
  * panel is per (ticker, day) independent — partition-parallel across a
  * cluster; the spine join is a broadcast of a generated sequence.
  */
object Oi {

  val NsPerSec: Long = 1000000000L

  /** Epoch-nanos event time from date + seconds-after-midnight; integer
    * arithmetic (SURVEY §7.4.3: Double cannot hold epoch nanos). */
  def tsNs: Column =
    unix_date(col("date")).cast("long") * lit(86400L * NsPerSec) +
      (col("time_s") * lit(1e9)).cast("long")

  /** W7 right-closed ceil bin label in epoch nanos; `daily` = midnight of
    * the trade date (pandas `normalize()`, `order_imbalance.py:356-358`). */
  def binNs(deltaNs: Long): Column =
    if (deltaNs <= 0) unix_date(col("date")).cast("long") * lit(86400L * NsPerSec)
    else TimeBins.ceilNs(tsNs, deltaNs)

  /** J3 iceberg tag: visible exec (type 4) followed by a submit (type 1)
    * at the same (ticker, price) within 1 ms inclusive
    * (`order_imbalance.py:25-48`). */
  def tagIcebergs(events: DataFrame, toleranceNs: Long = 1000000L)
      : DataFrame = {
    val withTs = events.withColumn("__ts_ns", tsNs)
    val execs = withTs.filter(col("event_type") === EventType.VisibleExec)
    val submits = withTs.filter(col("event_type") === EventType.Submit)
    AsOfJoin.forward(execs, submits, "__ts_ns", Seq("ticker", "price"),
        attach = Nil, toleranceNs = Some(toleranceNs))
      .withColumn("iceberg", col("asof_time").isNotNull.cast("int"))
      .drop("asof_time", "__ts_ns")
  }

  /** The OI panel for one delta: one row per (ticker, date, bin) with the
    * requested OI column(s) plus ordered first/last midprice and weighted
    * midprice (A5 via min_by/max_by on the explicit seq order). */
  def panel(events: DataFrame, deltaNs: Long, kind: String): DataFrame = {
    val e = events.withColumn("bin_ns", binNs(deltaNs))
    val keys = Seq(col("ticker"), col("date"), col("bin_ns"))
    val side = col("direction")
    val sz = col("size").cast("double")

    val base: DataFrame = kind match {
      case "vis" =>
        val aggs = Imbalance.oiColumns(side, sz, "_vis") ++ firstLastAggs
        e.filter(col("event_type") === EventType.VisibleExec)
          .groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      case "hid" =>
        val aggs = Imbalance.weightedOiColumns(col("pred_prob"), sz,
          "_hid") ++ firstLastAggs
        e.filter(col("event_type") === EventType.HiddenExec)
          .groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      case "all" =>
        // visible rows get prob 0 (dir -1 / buy) or 1 (dir +1 / sell):
        // order_imbalance.py:290-291
        val prob = when(col("event_type") === EventType.VisibleExec,
          when(side === -1, 0.0).otherwise(1.0)).otherwise(col("pred_prob"))
        val aggs = Imbalance.weightedOiColumns(prob, sz, "_all") ++
          firstLastAggs
        e.filter(col("event_type").isin(EventType.VisibleExec,
            EventType.HiddenExec))
          .groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      case "iceberg" =>
        val tagged = tagIcebergs(events).withColumn("bin_ns", binNs(deltaNs))
        def oi(cond: Column, sfx: String): Seq[Column] = {
          val buy = sum(when(cond && side === -1, sz).otherwise(0.0))
          val sell = sum(when(cond && side === 1, sz).otherwise(0.0))
          Seq(((buy - sell) / when(buy + sell =!= 0.0, buy + sell))
            .as(s"order_imbalance$sfx"))
        }
        val aggs = oi(col("iceberg") === 0, "_vis") ++
          oi(col("iceberg") === 1, "_ib") ++ firstLastAggs
        tagged.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      case "size" =>
        // per-(ticker,date) exact size terciles over hidden execs
        // (order_imbalance.py:435-448)
        val hid = e.filter(col("event_type") === EventType.HiddenExec)
        val terciles = hid.groupBy(col("ticker"), col("date")).agg(
          expr("percentile(size, 0.3333333333333333)").as("__q1"),
          expr("percentile(size, 0.6666666666666666)").as("__q2"))
        val tagged = hid.join(broadcast(terciles), Seq("ticker", "date"))
          .withColumn("__b", when(sz < col("__q1"), "small")
            .when(sz <= col("__q2"), "medium").otherwise("large"))
        def woi(b: String): Column = {
          val cond = col("__b") === b
          val num = sum(when(cond, sz * (lit(1.0) - lit(2.0) *
            col("pred_prob"))).otherwise(0.0))
          val den = sum(when(cond, sz).otherwise(0.0))
          (num / when(den =!= 0.0, den)).as(s"order_imbalance_$b")
        }
        val aggs = Seq(woi("small"), woi("medium"), woi("large")) ++
          firstLastAggs
        tagged.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      case "agg" =>
        // aggressiveness buckets (order_imbalance.py:419-432): relative to
        // the PREDICTED direction, a hidden exec is low-aggressive when
        // priced on the passive side of the half-spread, high-aggressive
        // on the aggressive side; agg_ratio == 0.5 exactly is "mid"
        val hid = e.filter(col("event_type") === EventType.HiddenExec)
        val b = when(col("agg_ratio") === 0.5, "agg_mid")
          .when((col("pred_dir") === 1 && col("agg_ratio") < 0.5) ||
            (col("pred_dir") === -1 && col("agg_ratio") > 0.5), "agg_low")
          .when((col("pred_dir") === 1 && col("agg_ratio") > 0.5) ||
            (col("pred_dir") === -1 && col("agg_ratio") < 0.5), "agg_high")
        def woiA(bkt: String): Column = {
          val cond = col("__b") === bkt
          val num = sum(when(cond, sz * (lit(1.0) - lit(2.0) *
            col("pred_prob"))).otherwise(0.0))
          val den = sum(when(cond, sz).otherwise(0.0))
          (num / when(den =!= 0.0, den)).as(s"order_imbalance_$bkt")
        }
        val aggs = Seq(woiA("agg_low"), woiA("agg_mid"),
          woiA("agg_high")) ++ firstLastAggs
        hid.withColumn("__b", b).groupBy(keys: _*)
          .agg(aggs.head, aggs.tail: _*)
      case other => throw new IllegalArgumentException(
        s"unknown OI kind: $other")
    }
    base
  }

  /** A5 first/last midprice + weighted midprice in explicit event order
    * (min_by/max_by on seq; `order_imbalance.py:304-309`). */
  private def firstLastAggs: Seq[Column] = Seq(
    min_by(col("midprice"), col("seq")).as("first_midprice"),
    max_by(col("midprice"), col("seq")).as("last_midprice"),
    min_by(col("weighted_mp"), col("seq")).as("first_weighted_mp"),
    max_by(col("weighted_mp"), col("seq")).as("last_weighted_mp"))

  /** J5 + W7 spine: densify an intraday panel to every bin in
    * (sessionStart+delta, sessionEnd] per (ticker, date), fill OI columns
    * with 0, and drop the last (incomplete) intraday bin
    * (`order_imbalance.py:301`, `321-324`, `338-359`). */
  def densifyPanel(panel: DataFrame, deltaNs: Long,
                   sessionStartSec: Double = 36000.0,
                   sessionEndSec: Double = 55800.0): DataFrame = {
    if (deltaNs <= 0) return panel // daily panels are already dense
    val oiCols = panel.columns.filter(_.startsWith("order_imbalance"))
    val days = panel.select(col("ticker"), col("date")).distinct()
    val spine = days.select(col("ticker"), col("date"),
      explode(sequence(
        unix_date(col("date")).cast("long") * lit(86400L * NsPerSec) +
          lit((sessionStartSec * 1e9).toLong + deltaNs),
        unix_date(col("date")).cast("long") * lit(86400L * NsPerSec) +
          lit((sessionEndSec * 1e9).toLong),
        lit(deltaNs))).as("bin_ns"))
    val dense = spine.join(panel, Seq("ticker", "date", "bin_ns"), "left")
      .na.fill(0.0, oiCols)
    TimeBins.dropLastBin(dense, "bin_ns", Seq("ticker", "date"))
  }

  /** Combined panel (J4): join several kinds on the bin key
    * (`order_imbalance.py:328-335`). */
  def combined(panels: Seq[DataFrame]): DataFrame = {
    val keys = Seq("ticker", "date", "bin_ns")
    panels.reduce { (a, b) =>
      val dupes = b.columns.filterNot(keys.contains)
        .filter(a.columns.contains)
      a.join(dupes.foldLeft(b)((d, c) => d.drop(c)), keys)
    }
  }
}
