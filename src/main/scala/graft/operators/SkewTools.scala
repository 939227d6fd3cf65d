package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot grouping keys (SURVEY §7.4.6: the
  * cross-sectional per-bin step concentrates every ticker into one bin
  * key at market open; a 100 TB shuffle with a hot key stalls on one
  * reducer).
  *
  * [[saltedAgg]] implements the classic two-stage aggregation: stage 1
  * groups on (key, salt) spreading a hot key over `salts` reducers; stage
  * 2 re-aggregates the partial rows on the key alone. Correct for any
  * decomposable aggregate (sum/count/min/max — pass the re-combine
  * expressions). AQE's skew-join splitting handles the JOIN side of skew;
  * this handles the AGGREGATION side, which AQE does not rebalance.
  */
object SkewTools {

  /** Two-stage salted aggregation.
    * @param partialAggs stage-1 aggregate columns (named)
    * @param finalAggs   stage-2 re-combination over the stage-1 names
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partialAggs: Seq[Column], finalAggs: Seq[Column])
      : DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(salts)))
    val stage1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted count/sum/min/max convenience: the common decomposable set. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame =
    saltedAgg(df, keys, salts,
      partialAggs = Seq(
        count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"),
        min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx")),
      finalAggs = Seq(
        sum(col("__n")).as("n"), sum(col("__s")).as(s"sum_$valueCol"),
        min(col("__mn")).as(s"min_$valueCol"),
        max(col("__mx")).as(s"max_$valueCol")))

  /** Broadcast-salt the SMALL side of a skewed join: replicate each small-
    * side row `salts` times so a salted big side still matches. Use when
    * AQE skew splitting is unavailable (e.g. a non-shuffle join input). */
  def explodeSalt(small: DataFrame, salts: Int): DataFrame =
    small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))

  def withSalt(big: DataFrame, salts: Int): DataFrame =
    big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(salts)))
}
