package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    import graft.operators.Dedup

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    docs.count()

    def t(label: String)(f: => Any): Unit = {
      val best = (1 to 3).map { _ =>
        val s = System.nanoTime(); f; (System.nanoTime - s) / 1e9
      }.min
      println(f"PROBE $label%-28s $best%.3f s")
    }

    t("xxhash64-sig k=32") {
      docs.select(Dedup.minHashSignature(col("text"), 3, 32))
        .selectExpr("max(element_at(minhash_sig, 1))").head()
    }
    t("portable-sig k=32") {
      docs.select(Dedup.minHashSignaturePortable(col("text"), 3, 32))
        .selectExpr("max(element_at(minhash_sig, 1))").head()
    }
    spark.stop()
  }
}
