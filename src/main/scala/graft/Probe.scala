package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.1"
    import graft.core.Tables
    import graft.operators.{Curation, Dedup, Sampling}
    import graft.functions.TextFunctions

    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime - s) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    t("docs.count")(docs.count())
    val cfg = Curation.FullConfig(segTokens = 3, segMinCopies = 2,
      maxDupTokenFrac = 0.6, minQuality = 0.3,
      budgetTokens = 50000L, alpha = 0.5, maxEpochs = 4.0, seed = 0L)

    val deduped = Dedup.exact(docs, "text", "doc_id")
    t("exact dedup")(deduped.count())
    val cleaned = Dedup.dropRepeatedSegments(deduped, "doc_id",
        Dedup.tokenSegments(col("text"), cfg.segTokens), cfg.segMinCopies)
      .filter(col("n_kept") > 0)
    t("seg dedup")(cleaned.count())
    val gated = cleaned
      .filter(TextFunctions.dupTokenFrac(col("cleaned")) <= cfg.maxDupTokenFrac)
      .withColumn("quality_score", TextFunctions.qualityScore(col("cleaned")))
      .filter(col("quality_score") >= cfg.minQuality)
      .withColumn("n_tokens_clean", TextFunctions.nTokens(col("cleaned")).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val plan = t("mixturePlan")(
      Sampling.mixturePlan(gated, "source", "n_tokens_clean",
        cfg.budgetTokens, cfg.alpha, cfg.maxEpochs))
    t("applyMixture+select")(
      Sampling.applyMixture(gated, "source", "doc_id", plan, cfg.seed)
        .select(col("doc_id"), col("source"), col("epoch_copy"),
          md5(col("cleaned")).as("cleaned_md5")).count())
    gated.unpersist()

    t("seg dedup warm2")(cleaned.count())
    t("gated unpersisted warm")(
      cleaned
        .filter(TextFunctions.dupTokenFrac(col("cleaned")) <= cfg.maxDupTokenFrac)
        .withColumn("quality_score", TextFunctions.qualityScore(col("cleaned")))
        .filter(col("quality_score") >= cfg.minQuality)
        .count())
    (1 to 3).foreach { i =>
      t(s"curateFull end-to-end #$i") {
        Curation.curateFull(docs, "doc_id", "text", "source", cfg).count()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
