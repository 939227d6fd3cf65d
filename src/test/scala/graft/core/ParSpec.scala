package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Par.fanOut — the r20 scale-adaptive fan for compute-heavy row-local
  * stages over small single-split scans. The contracts that matter:
  * content is NEVER changed (the callers are all order-independent
  * operators), the fan only fires on scan-rooted frames below the
  * session's parallelism, and the ScaleBench kill-switch really kills
  * it (committed growth laws measure the unfanned scale path). */
class ParSpec extends SparkSpec {

  private def parquetFrame(n: Int): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_par_spec").toString
    spark.range(n.toLong).select(col("id"),
        (col("id") % 7).cast("double").as("x"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("single-split scan fans out to the session parallelism") {
    val df = parquetFrame(500)
    assert(df.rdd.getNumPartitions == 1)
    val fanned = Par.fanOut(df, col("id"))
    assert(fanned.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("content is bit-identical either way (projection + filter root)") {
    val df = parquetFrame(300).select(col("id"), (col("x") * 2).as("y"))
      .filter(col("id") =!= 5L)
    val a = df.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    val b = Par.fanOut(df, col("id")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(a.sameElements(b))
  }

  test("a frame already at/above parallelism is returned untouched") {
    val p = spark.sparkContext.defaultParallelism
    val df = parquetFrame(64)
    val wide = df.repartition(p + 2, col("id"))
    // not scan-rooted (repartition) — returned as-is, no extra exchange
    assert(Par.fanOut(wide, col("id")) eq wide)
  }

  test("non-scan-rooted plans (aggregates/joins/windows) never fan") {
    val df = parquetFrame(100)
    val agg = df.groupBy(col("x")).agg(count(lit(1)).as("n"))
    assert(Par.fanOut(agg, col("x")) eq agg)
    val joined = df.as("a").join(df.as("b"), "id")
    assert(Par.fanOut(joined) eq joined)
  }

  test("graft.noSmallInputFastPaths=1 (the ScaleBench pin) disables the fan") {
    val df = parquetFrame(200)
    System.setProperty("graft.noSmallInputFastPaths", "1")
    try assert(Par.fanOut(df, col("id")) eq df)
    finally System.clearProperty("graft.noSmallInputFastPaths")
  }
}
