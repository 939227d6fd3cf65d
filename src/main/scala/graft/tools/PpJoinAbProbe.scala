package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dedup

/** Dev-only interleaved A/B for the PPJoin prefix-index persist (r20):
  * OLD = candidate generation re-deriving the prefix subplan per join
  * side (inline copy of the pre-change shape), NEW = Dedup.jaccardPairs
  * with the persisted prefix. One JVM, alternating reps, so machine
  * drift hits both variants equally. Also asserts both variants emit the
  * same pair count. Not part of the library surface. */
object PpJoinAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def dropAll(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // inline copy of the PRE-change jaccardPairs (no prefix persist)
    def jaccardPairsOld(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
      val sh = df.select(col(idCol).as("id"),
          Dedup.shingles(col(textCol), n).as("sh"))
        .withColumn("sh_size", size(col("sh")))
        .filter(col("sh_size") > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ex = sh.select(col("id"), col("sh_size"),
        explode(col("sh")).as("shingle"))
      val freq = ex.groupBy("shingle").agg(count(lit(1)).as("__df"))
      val ranked = ex.join(freq, "shingle")
      val w = Window.partitionBy(col("id"))
        .orderBy(col("__df"), xxhash64(col("shingle")), col("shingle"))
      val prefix = ranked
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= greatest(
          (col("sh_size") - ceil(lit(threshold) * col("sh_size")) + 1L)
            .cast("long"), lit(1L)))
      val keep = Seq(col("id"), col("sh_size"), col("__rk"), col("shingle"))
      val a = prefix.select(keep: _*).toDF("id_a", "size_a", "__rka", "shingle")
      val b = prefix.select(keep: _*).toDF("id_b", "size_b", "__rkb", "shingle")
      val cand = a.join(b, Seq("shingle"))
        .where(col("id_a") < col("id_b") &&
          col("size_a") * threshold <= col("size_b") &&
          col("size_b") * threshold <= col("size_a"))
        .groupBy("id_a", "id_b")
        .agg(min(col("size_a")).as("size_a"), min(col("size_b")).as("size_b"),
          min(col("__rka")).as("__rka"), min(col("__rkb")).as("__rkb"))
        .where((lit(1L) + least(col("size_a") - col("__rka"),
            col("size_b") - col("__rkb"))).cast("double") >=
          lit(threshold / (1.0 + threshold)) *
            (col("size_a") + col("size_b")).cast("double") - lit(1e-9))
        .select("id_a", "id_b")
      cand
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("inter",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
        .withColumn("jaccard", col("inter") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    }

    val docs = Tables.documents(spark, dir)
    docs.count()

    // sanity: identical pair counts
    val cOld = jaccardPairsOld(docs, "doc_id", "text", 3, 0.8).count()
    dropAll()
    val cNew = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8).count()
    dropAll()
    println(s"AB-PPJOIN pair counts old=$cOld new=$cNew " +
      (if (cOld == cNew) "MATCH" else "MISMATCH"))

    val reps = 4
    def run(tag: String, thr: Double, old: Boolean): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        (if (old) jaccardPairsOld(docs, "doc_id", "text", 3, thr)
         else Dedup.jaccardPairs(docs, "doc_id", "text", 3, thr)).count()
        val d = (System.nanoTime() - t0) / 1e9
        dropAll()
        d
      }
      println(f"AB-PPJOIN $tag%-24s min ${times.min}%.3f  " +
        s"all ${times.map(t => f"$t%.2f").mkString(",")}")
    }
    for (_ <- 1 to 2) {
      run("t=0.8 OLD", 0.8, old = true)
      run("t=0.8 NEW", 0.8, old = false)
      run("t=0.5 OLD", 0.5, old = true)
      run("t=0.5 NEW", 0.5, old = false)
    }
    spark.stop()
  }
}
