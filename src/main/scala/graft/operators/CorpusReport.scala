package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Per-group corpus governance report — the "dataset card" numbers a
  * training-data pipeline publishes per source/language slice: volumes
  * (docs, tokens, chars), exact-duplicate load, and quality mass.
  *
  * Scale shape: ONE aggregation pass. The exact-dup flag rides the same
  * md5-partition window [[Dedup.exact]] uses (a duplicate = any row that
  * is not its hash group's winner), so the dup rate needs no join against
  * a dedup output; quality means go through DECIMAL sums (exact,
  * order-independent — the repo's moneySum rule). Shuffle volume is one
  * row per group after map-side partials.
  */
object CorpusReport {

  def report(docs: DataFrame, groupCols: Seq[String], idCol: String,
             textCol: String): DataFrame = {
    require(groupCols.nonEmpty, "report needs at least one group column")
    val winner = row_number().over(
      Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))) === 1
    docs
      .withColumn("__winner", winner)
      .withColumn("__q", TextFunctions.qualityScore(col(textCol)))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.nTokens(col(textCol)).cast("long")).as("tokens"),
        sum(length(col(textCol)).cast("long")).as("chars"),
        sum(when(!col("__winner"), 1L).otherwise(0L)).as("n_exact_dups"),
        (sum(col("__q").cast("decimal(18,9)")).cast("double") /
          count(lit(1))).as("mean_quality"))
  }
}
