package graft

import org.apache.spark.sql.functions._

/** Bucketing is the repeated-big-join answer at 100 TB: two tables
  * bucketed (and sorted) on the join key satisfy the join's required
  * distribution straight off disk, so the sort-merge join plans with
  * ZERO shuffle exchanges — the shuffle is paid once at write time and
  * amortized over every subsequent join. This spec pins that plan
  * property end-to-end through a real bucketed write + catalog read. */
class BucketedJoinSpec extends SparkSpec {

  test("equi-join of two tables bucketed on the key plans no shuffle " +
    "exchange (co-located sort-merge join), and results are correct") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.range(0, 10000)
        .select(col("id"), pmod(col("id"), lit(97L)).as("x"))
        .write.bucketBy(8, "id").sortBy("id")
        .mode("overwrite").saveAsTable("graft_bucketed_a")
      spark.range(0, 10000)
        .select(col("id"), (col("id") * 2).as("y"))
        .write.bucketBy(8, "id").sortBy("id")
        .mode("overwrite").saveAsTable("graft_bucketed_b")
      val joined = spark.table("graft_bucketed_a")
        .join(spark.table("graft_bucketed_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle:\n" + plan.take(2000))
      assert(joined.count() == 10000)
      // and the mismatched-bucketing control DOES shuffle: same data,
      // unbucketed right side
      spark.range(0, 10000).select(col("id"), (col("id") * 2).as("y"))
        .write.mode("overwrite").saveAsTable("graft_unbucketed_b")
      val control = spark.table("graft_bucketed_a")
        .join(spark.table("graft_unbucketed_b"), "id")
      val controlPlan = control.queryExecution.executedPlan.toString
      assert(controlPlan.contains("Exchange hashpartitioning"),
        "control should shuffle:\n" + controlPlan.take(2000))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_b")
      spark.sql("DROP TABLE IF EXISTS graft_unbucketed_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
