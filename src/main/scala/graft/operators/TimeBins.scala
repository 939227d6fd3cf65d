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
}
