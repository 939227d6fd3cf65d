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

  /** Full prep chain in reference order: event time, session filter,
    * event key, dedup (`prediction_ML_pipeline.py:82-127`). */
  def prepare(df: DataFrame,
              startSec: Double = 10 * 3600.0,
              endSec: Double = 15 * 3600.0 + 1800.0): DataFrame =
    dropDuplicateKeys(addEventKey(
      sessionFilter(Ingest.withEventTime(df), startSec, endSec)))
}
