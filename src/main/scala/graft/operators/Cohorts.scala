package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis (extension operator; the reference's
  * panels are time-binned aggregates, not user-lifecycle matrices).
  * Users are cohorted by their first active period; the matrix counts
  * how many of each cohort come back `offset` periods later.
  *
  * Scale design: the corpus collapses to DISTINCT (user, period)
  * active pairs in the first shuffle — every later stage works on
  * that activity frame (|users| × periods-active, orders of magnitude
  * under the event count). First-period-per-user is a partial-agg
  * groupBy; the cohort tag joins back on user (both sides hash by
  * user); the matrix itself is at most periods² cells. Counts are
  * plain `count(*)`, not count-distinct: after the distinct, a user
  * holds exactly one row per (cohort, offset) cell because
  * period = cohort + offset is determined by the cell. Period
  * arithmetic is integer `div` — exact for epoch-nanos past 2^53.
  */
object Cohorts {

  /** Retention matrix: one row per (cohort_period, period_offset) with
    * the users active in that cell, the cohort's size, and the
    * retention ratio. `tsCol` is int64 epoch-nanos. */
  def retention(activity: DataFrame, userCol: String, tsCol: String,
                periodNs: Long): DataFrame = {
    require(periodNs > 0, s"periodNs must be positive, got $periodNs")
    val periods = activity
      .select(col(userCol).as("user"),
        expr(s"$tsCol div ${periodNs}L").as("period"))
      .distinct()
    val cohorts = periods.groupBy("user")
      .agg(min(col("period")).as("cohort_period"))
    val ret = periods.join(cohorts, "user")
      .groupBy(col("cohort_period"),
        (col("period") - col("cohort_period")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = ret.filter(col("period_offset") === 0)
      .select(col("cohort_period"), col("n_users").as("cohort_size"))
    ret.join(sizes, "cohort_period")
      .withColumn("retention",
        col("n_users").cast("double") / col("cohort_size").cast("double"))
  }
}
