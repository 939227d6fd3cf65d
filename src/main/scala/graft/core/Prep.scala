package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-table preprocessing (SURVEY §7.1 module 3;
  * `/root/reference/prediction_ML_pipeline.py:82-127`).
  * One shuffle on (ticker, date) feeds every step — the same partitioning
  * the downstream feature windows reuse, so prep adds no extra exchange.
  */
object Prep {

  /** A6: event_number = cumcount within (event_time, ticker) ordered by
    * seq; event_number_at_t = count of events at that timestamp
    * (`prediction_ML_pipeline.py:99-100`). */
  def addEventKey(df: DataFrame): DataFrame = {
    val byT = Window.partitionBy(col("ticker"), col("date"),
      col("event_time"))
    df.withColumn("event_number",
        row_number().over(byT.orderBy(col("seq"))).cast("long") - 1)
      .withColumn("event_number_at_t", count(lit(1)).over(byT))
  }

  /** P3: keep events whose time-of-day lies in [start, end] seconds after
    * midnight (reference: 10:00-15:30, `prediction_ML_pipeline.py:108-117`;
    * EDA variant 9:30-16:00). Computed from `time_s` (exact seconds after
    * midnight), matching pandas `between_time` inclusive endpoints. */
  def sessionFilter(df: DataFrame,
                    startSec: Double = 10 * 3600.0,
                    endSec: Double = 15 * 3600.0 + 1800.0): DataFrame =
    df.filter(col("time_s") >= startSec && col("time_s") <= endSec)

  /** P4: drop duplicate (ticker, date, event_time, event_number) keys,
    * keep='first' in explicit seq order
    * (`prediction_ML_pipeline.py:119-121`). */
  def dropDuplicateKeys(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker"), col("date"),
      col("event_time"), col("event_number")).orderBy(col("seq"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** O1: the global time sort made explicit — each row's 0-based
    * position under ORDER BY (tsCol, tieCol), computed WITHOUT a
    * corpus-wide window via the two-level scan (the Packing/Sharding
    * idiom): range-slice on the time axis (`sliceWidth` units of tsCol
    * per slice — monotone, so slice order IS time order), within-slice
    * row_number, tiny slice-count offsets cumulated and broadcast back.
    * The reference sorts whole day-frames by datetime before as-of
    * alignment (`order_imbalance.py:31-32`); this is that sort as a
    * rank column a distributed engine can verify and reuse. */
  def timeOrderSeq(df: DataFrame, tsCol: String, tieCol: String,
                   sliceWidth: Long = 3600L * 1000 * 1000 * 1000,
                   posCol: String = "pos"): DataFrame = {
    require(sliceWidth > 0, s"sliceWidth must be positive, got $sliceWidth")
    // NULL timestamps: a NULL slice key would silently vanish at the
    // offsets equi-join — route them to a sentinel slice below every
    // real one instead, which is also where ORDER BY puts NULLs in
    // Spark (nulls first ascending), so the contract stays "ROW_NUMBER
    // minus one" with null times leading
    val sliced = df.withColumn("__slice",
      coalesce(expr(s"$tsCol div $sliceWidth"), lit(Long.MinValue)))
    val inSlice = Window.partitionBy(col("__slice"))
      .orderBy(col(tsCol), col(tieCol))
    val within = sliced.withColumn("__rk",
      row_number().over(inSlice).cast("long") - 1L)
    // offsets over the tiny per-slice count frame (Sharding convention:
    // the lit(0) key constant-folds to Exchange SinglePartition over a
    // post-aggregate frame)
    val sliceOrder = Window.partitionBy(lit(0)).orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliced.groupBy(col("__slice"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(sliceOrder), lit(0L)))
      .select(col("__slice"), col("__offset"))
    within.join(broadcast(offsets), Seq("__slice"))
      .withColumn(posCol, col("__offset") + col("__rk"))
      .drop("__slice", "__rk", "__offset")
  }

  /** Full prep chain in reference order: event time, session filter,
    * event key, dedup (`prediction_ML_pipeline.py:82-127`). */
  def prepare(df: DataFrame,
              startSec: Double = 10 * 3600.0,
              endSec: Double = 15 * 3600.0 + 1800.0): DataFrame =
    dropDuplicateKeys(addEventKey(
      sessionFilter(Ingest.withEventTime(df), startSec, endSec)))
}
