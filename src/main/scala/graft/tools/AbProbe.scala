package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.{Dedup, Packing, Sampling}

/** Dev-only interleaved A/B: the curate stage-barrier question, both
  * variants in ONE JVM with alternating reps so machine drift hits both
  * equally. Not part of the library surface. */
object AbProbe {
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

    // curate body, exact-jaccard face, barrier switchable
    def curateJ(persistSampled: Boolean, exact: Boolean): DataFrame = {
      val docs = Tables.documents(spark, dir)
      val deduped = Dedup.exact(docs, "text", "doc_id")
      val scored = deduped.withColumn("quality_score",
        TextFunctions.qualityScore(col("text")))
      val filtered = scored.filter(col("quality_score") >= 0.2)
      val sampled0 = Sampling.bernoulliSample(filtered, "doc_id", 0.9, 5L)
      val sampled =
        if (persistSampled) sampled0.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else sampled0
      val pairs =
        (if (exact)
           Dedup.jaccardPairs(sampled, "doc_id", "text", 3, 0.8)
         else Dedup.minHashLshPairsPortable(sampled, "doc_id", "text")
           .filter(col("est_jaccard") >= 0.9))
          .select(col("id_b").as("doc_id"))
      val unique = sampled.join(pairs, Seq("doc_id"), "left_anti")
      Packing.concatChunks(unique.select(col("doc_id"), col("n_chars"),
          col("lang"), col("text"), col("quality_score")),
        "doc_id", "n_chars", 16384L, 5L, groupCols = Seq("lang"),
        carryCols = Seq("text", "quality_score"))
    }

    // warm both plans once
    curateJ(persistSampled = false, exact = true).count(); dropAll()
    curateJ(persistSampled = true, exact = true).count(); dropAll()

    val reps = 5
    def run(tag: String, persist: Boolean, exact: Boolean): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        curateJ(persist, exact).count()
        val d = (System.nanoTime() - t0) / 1e9
        dropAll()
        d
      }
      val best = times.min
      println(f"AB $tag%-28s min $best%.3f  all ${times.map(t => f"$t%.2f").mkString(",")}")
      best
    }
    // interleave so drift is shared
    for (_ <- 1 to 2) {
      run("jaccard NO barrier", persist = false, exact = true)
      run("jaccard WITH barrier", persist = true, exact = true)
      run("lsh     NO barrier", persist = false, exact = false)
      run("lsh     WITH barrier", persist = true, exact = false)
    }
    spark.stop()
  }
}
