package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile-band outlier filtering (SURVEY §2.2 P6;
  * `/root/reference/order_imbalance.py:233-237`): keep rows whose column
  * value lies within the [lo, hi] exact quantiles, computed over the whole
  * frame or per group.
  *
  * Exact `percentile` (sort-based) is used instead of `percentile_approx`
  * because tercile/band boundaries decide row membership — an approx sketch
  * can flip rows near the cut (SURVEY §4.3). The quantile row is one row per
  * group, broadcast back; the scan stays a single pass + broadcast join.
  */
object Quantiles {

  /** EXACT linear-interpolated percentiles of a single ungrouped column,
    * computed with a distributed range-partitioned sort instead of the
    * built-in `percentile` aggregate (which buffers every value in ONE
    * reducer — the 100 TB anti-pattern). Two jobs: count, then sort +
    * select the two bracketing ranks per quantile. Interpolation formula
    * matches Spark/pandas/DuckDB `quantile_cont`:
    * v = lo + (hi - lo) * frac at rank h = (n-1)*q. */
  def exactPercentiles(df: DataFrame, valueCol: String, qs: Seq[Double])
      : Seq[Double] = {
    val rdd = df.select(col(valueCol).cast("double")).na.drop()
      .rdd.map(_.getDouble(0))
    val n = rdd.count()
    require(n > 0, s"exactPercentiles: no non-null values in $valueCol")
    val hs = qs.map(q => (n - 1) * q)
    val wanted = hs.flatMap(h =>
      Seq(math.floor(h).toLong, math.ceil(h).toLong)).toSet
    val picked = rdd.sortBy(identity).zipWithIndex()
      .filter { case (_, i) => wanted.contains(i) }
      .map(_.swap).collectAsMap()
    hs.map { h =>
      val lo = picked(math.floor(h).toLong)
      val hi = picked(math.ceil(h).toLong)
      lo + (hi - lo) * (h - math.floor(h))
    }
  }

  /** Winsorization: clip `valueCol` at its [lo, hi] exact percentiles —
    * the outlier treatment for feature columns that keeps row count
    * (unlike [[bandFilter]], which drops the tails). Bounds come from the
    * distributed [[exactPercentiles]] (two driver doubles), then the clip
    * is a row-local `least/greatest` — no extra shuffle. */
  def winsorize(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                outCol: String = ""): DataFrame = {
    require(lo <= hi, s"winsorize bounds inverted: $lo > $hi")
    val target = if (outCol.isEmpty) s"${valueCol}_wins" else outCol
    val Seq(l, h) = exactPercentiles(df, valueCol, Seq(lo, hi))
    df.withColumn(target,
      least(greatest(col(valueCol).cast("double"), lit(l)), lit(h)))
  }

  /** Keep rows inside the exact [lo, hi] quantile band.
    *
    * Ungrouped: bounds come from the distributed [[exactPercentiles]]
    * sort (two driver doubles), then a row-local filter — the built-in
    * `percentile` aggregate would buffer EVERY value in one reducer, the
    * 100 TB anti-pattern this module exists to avoid. Grouped: per-group
    * `percentile` aggregates, whose buffers are bounded by the per-group
    * value count (ticker-day sized here — MBs, not the corpus); pass
    * `approx = true` for groups beyond that (approx_percentile's KLL-style
    * sketch is constant-memory per group; band edges then carry the
    * sketch's rank-error epsilon). */
  def bandFilter(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                 by: Seq[String] = Nil, approx: Boolean = false,
                 accuracy: Int = 10000): DataFrame = {
    if (by.isEmpty) {
      val Seq(l, h) = exactPercentiles(df, valueCol, Seq(lo, hi))
      df.filter(col(valueCol) >= l && col(valueCol) <= h)
    } else {
      val pctFn = if (approx) s"approx_percentile($valueCol, %s, $accuracy)"
                  else s"percentile($valueCol, %s)"
      val bounds = df.groupBy(by.map(col): _*)
        .agg(expr(pctFn.format(lo)).as("__lo"),
             expr(pctFn.format(hi)).as("__hi"))
      df.join(broadcast(bounds), by)
        .filter(col(valueCol) >= col("__lo") && col(valueCol) <= col("__hi"))
        .drop("__lo", "__hi")
    }
  }
}
