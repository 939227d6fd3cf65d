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

  def bandFilter(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                 by: Seq[String] = Nil): DataFrame = {
    val bounds =
      if (by.isEmpty)
        df.agg(expr(s"percentile($valueCol, $lo)").as("__lo"),
               expr(s"percentile($valueCol, $hi)").as("__hi"))
      else
        df.groupBy(by.map(col): _*)
          .agg(expr(s"percentile($valueCol, $lo)").as("__lo"),
               expr(s"percentile($valueCol, $hi)").as("__hi"))
    val joined =
      if (by.isEmpty) df.crossJoin(broadcast(bounds))
      else df.join(broadcast(bounds), by)
    joined
      .filter(col(valueCol) >= col("__lo") && col(valueCol) <= col("__hi"))
      .drop("__lo", "__hi")
  }
}
