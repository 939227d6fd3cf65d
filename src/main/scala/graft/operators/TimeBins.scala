package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Right-closed / right-labeled time binning + bin-spine densification.
  *
  * Semantics follow pandas `Timestamp.ceil(delta)` as used by the reference
  * (`/root/reference/order_imbalance.py:272-278`): a timestamp is mapped to
  * the bin whose *right edge* labels it, and a timestamp exactly on a bin
  * edge maps to itself. The bin spine (`order_imbalance.py:338-359`)
  * materializes every bin in the session range so empty bins exist with
  * zero/NULL aggregates (densification, `order_imbalance.py:301`).
  *
  * All arithmetic is integer (epoch nanoseconds as LongType): epoch-nanos of
  * 2024+ (~1.7e18) exceed Double's 2^53 exact-integer range, so any
  * double-based ceil would corrupt low-order bits. `pmod` keeps the whole
  * computation in Long and inside whole-stage codegen.
  */
object TimeBins {

  /** Ceil an epoch-nanos Long column to a multiple of `stepNs`
    * (right-closed: exact multiples map to themselves).
    * `ceil(ts) = ts + ((-ts) mod step)` in non-negative `pmod` arithmetic.
    */
  def ceilNs(tsNs: Column, stepNs: Long): Column =
    (tsNs + pmod(-tsNs, lit(stepNs))).as("bin_ns")

  /** Floor an epoch-nanos Long column to a multiple of `stepNs`
    * (left-closed labeling, e.g. pandas `resample(...).sum()` label='left'). */
  def floorNs(tsNs: Column, stepNs: Long): Column =
    (tsNs - pmod(tsNs, lit(stepNs))).as("bin_ns")

  /** Full bin spine: one row per bin label in [`startNs` ceiled, `endNs`],
    * step `stepNs` — distributed via `sequence` + `explode` (no driver loop).
    * Optionally cross-joined with a (small) key DataFrame so every
    * (key, bin) cell exists.
    */
  def spine(df: DataFrame, startNs: Long, endNs: Long, stepNs: Long,
            binCol: String = "bin_ns"): DataFrame = {
    val first = startNs + Math.floorMod(-startNs, stepNs)
    df.sparkSession.range(1).select(
      explode(sequence(lit(first), lit(endNs), lit(stepNs))).as(binCol))
  }

  /** Densify: left-join grouped aggregates onto the full spine so empty bins
    * appear, filling the listed numeric columns with 0
    * (`order_imbalance.py:301`, J5). `keys` are non-bin join keys that must
    * also be densified (cross product of spine x distinct keys).
    */
  def densify(agg: DataFrame, spineDf: DataFrame, binCol: String,
              keys: Seq[String], fillZero: Seq[String]): DataFrame = {
    val keyed =
      if (keys.isEmpty) spineDf
      else spineDf.crossJoin(agg.select(keys.map(col): _*).distinct())
    val joined = keyed.join(agg, binCol +: keys, "left")
    if (fillZero.isEmpty) joined else joined.na.fill(0, fillZero)
  }

  /** Drop the final (incomplete) intraday bin, mirroring `grouped[:-1]`
    * (`order_imbalance.py:321-324`): keep bins strictly before the max —
    * per `partitionCols` group (the reference drops per ticker-day), or
    * globally when no partitions are given. */
  def dropLastBin(df: DataFrame, binCol: String,
                  partitionCols: Seq[String] = Nil): DataFrame = {
    if (partitionCols.isEmpty) {
      val mx = df.agg(max(col(binCol)).as("__mx"))
      df.join(broadcast(mx), col(binCol) < col("__mx")).drop("__mx")
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(partitionCols.map(col): _*)
      df.withColumn("__mx", max(col(binCol)).over(w))
        .filter(col(binCol) < col("__mx")).drop("__mx")
    }
  }

  /** Time-weighted average per (key, bin) — the TWAP convention for
    * irregular observations: each value HOLDS from its timestamp until
    * the next observation of the same key or the bin's right edge,
    * whichever comes first (staircase interpolation, no carry into the
    * next bin), and the average weights each value by its holding time.
    * A plain `avg` over-counts bursts; TWAP is the standard fix for
    * quote/price panels sampled at event time.
    *
    * Holding times are exact LONG nanoseconds; value·dt products are
    * summed through DECIMAL(28,4) (one identical double multiply, then
    * exact order-independent decimal addition — the moneySum rule), so
    * the aggregate is engine- and layout-exact. One window shuffle on
    * the key (lead), one partial-agg shuffle to the (key, bin) frame.
    * Tie timestamps get dt = 0 under the (ts, tieBreak) total order —
    * only the last copy holds mass; the last event in each bin always
    * holds to the edge, so every output bin has weight > 0.
    *
    * NULL-value rows are dropped BEFORE the window: a missing
    * observation is not a new level, so the previous value's staircase
    * extends across it (its holding time flows to the prior observation,
    * not into a silent weight_ns inflation with no matching value·dt
    * mass). `n_obs` counts the non-null observations; a (key, bin) whose
    * observations are all NULL emits no row. */
  def twap(df: DataFrame, keyCols: Seq[String], tsCol: String,
           valueCol: String, stepNs: Long, tieBreak: String): DataFrame = {
    require(stepNs > 0, s"stepNs must be positive, got $stepNs")
    require(keyCols.nonEmpty, "twap needs key columns")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieBreak))
    val binned = df
      .filter(col(valueCol).isNotNull)
      .withColumn("bin_ns", floorNs(col(tsCol), stepNs))
      .withColumn("__end", col("bin_ns") + lit(stepNs))
      .withColumn("__dt",
        least(coalesce(lead(col(tsCol), 1).over(w), col("__end")),
          col("__end")) - col(tsCol))
    binned
      .groupBy((keyCols.map(col) :+ col("bin_ns")): _*)
      .agg(
        count(lit(1)).as("n_obs"),
        sum(col("__dt")).as("weight_ns"),
        sum((col(valueCol) * col("__dt")).cast("decimal(28,4)"))
          .cast("double").as("__vdt"))
      .withColumn("twap",
        when(col("weight_ns") > 0,
          col("__vdt") / col("weight_ns").cast("double")))
      .drop("__vdt")
  }
}
