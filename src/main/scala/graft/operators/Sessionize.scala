package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization (extension operator; the reference is pure batch with no
  * sessions — SURVEY §2.10). Batch form is gaps-and-islands: a new session
  * starts when the gap to the previous event exceeds `gapNs`; session id =
  * running count of session starts. One window shuffle on the key, fully
  * native. The streaming twin is `session_window` (see
  * graft.streaming.StreamingOi docs) — the batch formulation below is
  * deterministic and oracle-checkable.
  */
object Sessionize {

  /** Tag each event with a per-key session index (0-based). */
  def withSessionId(df: DataFrame, keyCols: Seq[String], tsCol: String,
                    gapNs: Long, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieBreak))
    val isStart = when(col(tsCol) - lag(col(tsCol), 1).over(w) > gapNs ||
      lag(col(tsCol), 1).over(w).isNull, 1L).otherwise(0L)
    df.withColumn("__start", isStart)
      .withColumn("session_id",
        sum(col("__start")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)) - 1)
      .drop("__start")
  }

  /** Session path mining: counts of consecutive `stepCol` transitions
    * (from → to) within a session — the funnel/journey frequency table
    * ("view → click → purchase") real product analytics run over event
    * logs. A transition exists between an event and the NEXT event of
    * the same key when their gap is ≤ `gapNs` — exactly the pairs that
    * share a session under [[withSessionId]]'s rule, but computed
    * WITHOUT materializing session ids: one `lead` over the per-key
    * window (the same single shuffle sessionization itself pays — no
    * second exchange on (key, session)), then a partial-aggregated
    * count to the O(|steps|²) transition frame. */
  def transitions(df: DataFrame, keyCols: Seq[String], tsCol: String,
                  stepCol: String, gapNs: Long,
                  tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieBreak))
    df.withColumn("__next_ts", lead(col(tsCol), 1).over(w))
      .withColumn("__next_step", lead(col(stepCol), 1).over(w))
      .filter(col("__next_ts").isNotNull &&
        col("__next_ts") - col(tsCol) <= gapNs)
      .groupBy(col(stepCol).as("from_step"),
        col("__next_step").as("to_step"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Session summary table: one row per (key, session) with bounds,
    * duration, and event count. */
  def sessions(df: DataFrame, keyCols: Seq[String], tsCol: String,
               gapNs: Long, tieBreak: String,
               aggs: Seq[Column] = Nil): DataFrame = {
    val tagged = withSessionId(df, keyCols, tsCol, gapNs, tieBreak)
    val base = Seq(
      count(lit(1)).as("n_events"),
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      (max(col(tsCol)) - min(col(tsCol))).as("duration_ns"))
    tagged.groupBy((keyCols.map(col) :+ col("session_id")): _*)
      .agg((base ++ aggs).head, (base ++ aggs).tail: _*)
  }
}
