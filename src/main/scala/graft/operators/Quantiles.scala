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

  /** EXACT linear-interpolated percentiles of a single ungrouped column
    * without the built-in `percentile` aggregate (which buffers every
    * value in ONE reducer — the 100 TB anti-pattern) and without an RDD
    * sort (whose boxed multi-job lineage recomputes the scan ~5 times).
    *
    * Bracket-then-refine, three narrow whole-stage-codegen passes:
    *   1. one aggregation: row count + `approx_percentile` sketch values
    *      at (q ± slack) for every target quantile — the brackets;
    *   2. one aggregation: per-bracket "values strictly below" counts;
    *   3. one filtered groupBy: the (value, count) histogram of the few
    *      rows inside any bracket, collected to the driver, where the
    *      exact bracketing ranks floor/ceil((n-1)*q) resolve by
    *      cumulative count and interpolate.
    * The sketch's rank error is <= n/accuracy, so each bracket holds
    * O(n/accuracy) distinct values (tens at the default 1e5) and the
    * driver slice is O(#quantiles * n/accuracy) — scale `accuracy`
    * with n (e.g. n/1000) to keep it bounded at corpus sizes. If a
    * bracket ever fails to cover its ranks (verified at runtime), the
    * computation falls back to the distributed-sort path — exactness is
    * unconditional, never sketch-dependent. Interpolation matches
    * Spark/pandas/DuckDB `quantile_cont`:
    * v = lo + (hi - lo) * frac at rank h = (n-1)*q. */
  def exactPercentiles(df: DataFrame, valueCol: String, qs: Seq[Double],
                       accuracy: Int = 100000): Seq[Double] = {
    require(qs.nonEmpty, "exactPercentiles: no quantiles requested")
    require(accuracy > 0, s"accuracy must be positive, got $accuracy")
    val v = df.select(col(valueCol).cast("double").as("__v")).na.drop()
    val acc = accuracy
    val slack = 4.0 / acc
    val qLo = qs.map(q => math.max(0.0, q - slack))
    val qHi = qs.map(q => math.min(1.0, q + slack))
    val sketch = v.agg(
      count(col("__v")).as("__n"),
      expr(s"approx_percentile(__v, array(${qLo.mkString(", ")}), $acc)"),
      expr(s"approx_percentile(__v, array(${qHi.mkString(", ")}), $acc)")
    ).head()
    val n = sketch.getLong(0)
    require(n > 0, s"exactPercentiles: no non-null values in $valueCol")
    val los = sketch.getSeq[Double](1)
    val his = sketch.getSeq[Double](2)
    val below = {
      val aggs = los.zipWithIndex.map { case (l, i) =>
        sum(when(col("__v") < l, 1L).otherwise(0L)).as(s"__b$i") }
      val r = v.agg(aggs.head, aggs.tail: _*).head()
      los.indices.map(i => r.getLong(i))
    }
    val inAny = los.zip(his).map { case (l, h) =>
      col("__v") >= l && col("__v") <= h }.reduce(_ || _)
    val hist = v.filter(inAny).groupBy(col("__v"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    // value at 0-based global rank k, resolved inside bracket i; None when
    // the sketch's bracket missed the rank (degenerate distribution)
    def valueAt(i: Int, k: Long): Option[Double] =
      if (k < below(i)) None
      else {
        var cum = below(i)
        var res = Option.empty[Double]
        val it = hist.iterator
          .filter { case (value, _) => value >= los(i) && value <= his(i) }
        while (res.isEmpty && it.hasNext) {
          val (value, c) = it.next()
          if (k < cum + c) res = Some(value) else cum += c
        }
        res
      }
    val resolved = qs.zipWithIndex.map { case (q, i) =>
      val h = (n - 1) * q
      for (lo <- valueAt(i, math.floor(h).toLong);
           hi <- valueAt(i, math.ceil(h).toLong))
        yield lo + (hi - lo) * (h - math.floor(h))
    }
    if (resolved.forall(_.isDefined)) resolved.map(_.get)
    else sortedRankPercentiles(v, qs)
  }

  /** Distributed range-partitioned-sort exactness fallback (and the
    * differential reference for the bracket path): count, sort, pick the
    * two bracketing ranks per quantile. Multi-job and boxed — only runs
    * when a degenerate distribution defeats [[exactPercentiles]]'
    * sketch brackets. */
  private[operators] def sortedRankPercentiles(v: DataFrame,
                                               qs: Seq[Double])
      : Seq[Double] = {
    val rdd = v.rdd.map(_.getDouble(0))
    val n = rdd.count()
    require(n > 0, "sortedRankPercentiles: empty input")
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
                outCol: String = "", accuracy: Int = 100000): DataFrame = {
    require(lo <= hi, s"winsorize bounds inverted: $lo > $hi")
    val target = if (outCol.isEmpty) s"${valueCol}_wins" else outCol
    val Seq(l, h) = exactPercentiles(df, valueCol, Seq(lo, hi), accuracy)
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
  /** Per-group quantile rank of every row — `outCol` in [0, 1): the
    * 0-based rank of the row under (value, id) order within its group,
    * divided by the group size. The normalization that makes ONE global
    * quality threshold fair across sources with different score
    * distributions ("keep every source's top 30%"), instead of a raw
    * cut that nukes whole domains.
    *
    * Scalable by the same two-level trick as [[Packing]] /
    * [[Sharding.balancedShardTag]]: a group-wide
    * `Window.partitionBy(group).orderBy(value)` would funnel a dominant
    * source through ONE task at corpus scale, so rows are first bucketed
    * by an IEEE-exact affine map of the value onto `nBuckets` (one
    * per-group min/max/count aggregate, broadcast back — +,-,*,/ and
    * floor are correctly rounded in every IEEE engine, so the bucket of
    * a value is engine- and layout-exact), ranked within (group, bucket),
    * and offset by the tiny (groups x nBuckets) bucket-count frame.
    * Equal to the group-wide window by construction; degenerate
    * single-value groups collapse to bucket 0 (rank still correct, the
    * window partition is then that group — the unavoidable case).
    *
    * The id tie-break makes the rank a total order (two equal values get
    * distinct neighboring ranks deterministically) — this is the rank of
    * the ROW, not of the value.
    *
    * NULL handling matches the group-wide window exactly: NULL values
    * sort FIRST (Spark's `asc_nulls_first` default) via a dedicated
    * bucket -1 below every value bucket, and NULL group keys form their
    * own group (the joins are null-safe, mirroring window partitioning)
    * — no row is ever silently dropped. */
  def groupQuantileRank(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, idCol: String,
                        outCol: String = "quantile_rank",
                        nBuckets: Int = 1024): DataFrame = {
    require(groupCols.nonEmpty, "groupQuantileRank needs group columns")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    Sampling.requireIntegralKey(df, idCol) // a portable total order needs
    // an engine-neutral tie-break; string collation is not one
    import org.apache.spark.sql.expressions.Window
    val gCols = groupCols.map(col)
    val v = col(valueCol).cast("double")
    // null-safe equi-join on the group keys (<=>), so an all-NULL or
    // partially-NULL group key keeps its rows — a plain equi-join would
    // silently drop them while __n still counted them
    def joinNullSafe(left: DataFrame, right: DataFrame,
                     keys: Seq[String]): DataFrame = {
      val r = keys.foldLeft(right)((d, k) => d.withColumnRenamed(k, s"__r_$k"))
      val cond = keys.map(k => left(k) <=> r(s"__r_$k"))
        .reduce[Column](_ && _)
      left.join(broadcast(r), cond).drop(keys.map(k => s"__r_$k"): _*)
    }
    val stats = df.groupBy(gCols: _*)
      .agg(min(v).as("__mn"), max(v).as("__mx"),
        count(lit(1)).as("__n"))
    // bucket -1 holds NULL values (they sort first, as in a window's
    // asc_nulls_first order); min/max ignore NULLs, so the affine map
    // covers the non-null range. An all-NULL group (NULL __mn) falls
    // through both branches to the coalesce
    val keyed = joinNullSafe(df, stats, groupCols)
      .withColumn("__bkt", coalesce(
        when(v.isNull, lit(-1))
          .when(col("__mx") === col("__mn"), lit(0))
          .otherwise(least(
            floor((v - col("__mn")) / (col("__mx") - col("__mn"))
              * nBuckets),
            lit(nBuckets - 1).cast("long")).cast("int")),
        lit(-1)))
    val inBucket = Window.partitionBy(gCols :+ col("__bkt"): _*)
      .orderBy(v.asc_nulls_first, col(idCol))
    val within = keyed.withColumn("__rk",
      row_number().over(inBucket).cast("long") - 1L)
    val bucketOrder = Window.partitionBy(gCols: _*)
      .orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(gCols :+ col("__bkt"): _*)
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__off",
        coalesce(sum(col("__bn")).over(bucketOrder), lit(0L)))
      .select(gCols :+ col("__bkt") :+ col("__off"): _*)
    joinNullSafe(within, offsets, groupCols :+ "__bkt")
      .withColumn(outCol, (col("__off") + col("__rk")) / col("__n"))
      .drop("__mn", "__mx", "__n", "__bkt", "__rk", "__off")
  }

  /** Robust per-group outlier tagging: median/MAD (median absolute
    * deviation), the heavy-tail-safe alternative to mean/stddev z-scores
    * — a single fat-finger print can inflate a stddev cut past every
    * real outlier, while the median/MAD pair has a 50% breakdown point.
    * Flags rows whose |modified z| = 0.6745·|x − med| / MAD exceeds `k`
    * (Iglewicz–Hoaglin's recommended k = 3.5), and emits the signed
    * `robust_z` itself.
    *
    * Two grouped aggregations (median, then MAD of the deviations) +
    * two broadcast joins of the O(groups)-row stats frames — the scan
    * is read twice, nothing group-wide is ever windowed. Exact grouped
    * `percentile` buffers per-group values (fine for bounded groups —
    * same contract as [[bandFilter]]'s grouped path); pass
    * `approx = true` for corpus-sized groups (constant-memory KLL-style
    * sketch, flag decisions then carry its rank-error epsilon).
    *
    * Engine parity: the flag compares |x − med| against ONE precomputed
    * threshold factor times MAD (a single correctly-rounded multiply),
    * so the decision is bit-portable; `robust_z` is a division and is
    * expected to be micro-rounded by callers that gate on it. An
    * all-equal group has MAD 0: every row off the median flags, and
    * robust_z is NULL (no finite scale exists). */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Double = 3.5, approx: Boolean = false,
                  accuracy: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "madOutliers needs group columns")
    require(k > 0, s"k must be positive, got $k")
    val pct = if (approx) s"approx_percentile(%s, 0.5, $accuracy)"
              else "percentile(%s, 0.5)"
    val gCols = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val med = df.groupBy(gCols: _*)
      .agg(expr(pct.format(valueCol)).as("__med"))
    val withMed = df.join(broadcast(med), groupCols)
      .withColumn("__ad", abs(v - col("__med")))
    val mad = withMed.groupBy(gCols: _*)
      .agg(expr(pct.format("__ad")).as("__mad"))
    // 0.6745 ~ Phi^-1(0.75): |x-med|/MAD in "equivalent sigmas"
    val thresholdFactor = k / 0.6745
    withMed.join(broadcast(mad), groupCols)
      .withColumn("robust_z",
        when(col("__mad") > 0.0,
          lit(0.6745) * (v - col("__med")) / col("__mad")))
      .withColumn("is_outlier",
        col("__ad") > lit(thresholdFactor) * col("__mad"))
      .drop("__ad")
      .withColumnRenamed("__med", "group_median")
      .withColumnRenamed("__mad", "group_mad")
  }

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
