package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * rank a raw crawl by how much more likely each document is under a
  * model of a small TARGET (trusted/quality) corpus than under a model
  * of the raw corpus itself, then resample with probability increasing
  * in that importance. The paper uses hashed n-gram features; unigram
  * terms keep the exact pipeline shape (fit two models -> per-doc
  * log-likelihood ratio -> weighted resample) with engine-exact
  * arithmetic, the same simplification [[LmScore]] makes for the CCNet
  * perplexity filter. No reference analog — LLM-pipeline extension.
  *
  * Scale shape: two (term -> count) aggregations (the target one is
  * bounded by the target corpus — small by construction; the raw one is
  * the [[LmScore]] vocabulary cost), each reduced to a ONE-ROW broadcast
  * totals frame; scoring is a row-local token explode joined against
  * the two vocab frames on the term key — the join's right sides are
  * vocabularies, never the corpus. Per-doc sums run through
  * DECIMAL(18,9), so scores are bit-stable across partitionings and
  * engines. The resample accept is a row-local portable-hash test
  * ([[Sampling.weightedSample]]) — rerun/layout/retry stable.
  */
object Dsir {

  /** Per-document importance score under add-k unigram models:
    * `llr = sum_t [ ln p_target(t) - ln p_raw(t) ]` (natural log;
    * terms unseen in a model get its add-k floor). Positive = looks
    * more like the target than like the raw corpus. Output: input id,
    * `n_tokens`, `llr`, `llr_per_token`. */
  def importanceScores(docs: DataFrame, idCol: String, textCol: String,
                       target: DataFrame, targetTextCol: String,
                       k: Double = 0.5): DataFrame = {
    require(k > 0, s"importanceScores: smoothing k must be > 0, got $k")
    val tgt = LmScore.unigramCounts(target, targetTextCol)
      .withColumnRenamed("cnt", "__ct")
    val raw = LmScore.unigramCounts(docs, textCol)
      .withColumnRenamed("cnt", "__cr")
    val tTot = tgt.agg(sum(col("__ct")).as("__nt"),
      count(lit(1)).as("__vt"))
    val rTot = raw.agg(sum(col("__cr")).as("__nr"),
      count(lit(1)).as("__vr"))
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    toks
      .join(tgt, Seq("term"), "left")
      .join(raw, Seq("term"), "left") // always hits: raw is fit on docs
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col(idCol),
        (log((coalesce(col("__ct"), lit(0L)) + lit(k)) /
            (col("__nt") + lit(k) * col("__vt"))) -
          log((coalesce(col("__cr"), lit(0L)) + lit(k)) /
            (col("__nr") + lit(k) * col("__vr")))).as("__llr"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__llr").cast("decimal(18,9)")).cast("double").as("llr"))
      .withColumn("llr_per_token", col("llr") / col("n_tokens"))
  }

  /** Importance resampling: keep each document with probability
    * `sigmoid(llr_per_token / temperature)` — the deterministic analog
    * of the paper's Gumbel-noise draw, implemented as the portable-hash
    * acceptance of [[Sampling.weightedSample]] (same inputs and config
    * = same surviving set on any layout). The sigmoid is micro-rounded
    * before the acceptance test so the grid decision is engine-exact.
    * Returns the surviving docs with the score columns attached. */
  def resample(docs: DataFrame, idCol: String, textCol: String,
               target: DataFrame, targetTextCol: String,
               temperature: Double = 1.0, k: Double = 0.5,
               seed: Long = 0L): DataFrame = {
    require(temperature > 0,
      s"resample: temperature must be > 0, got $temperature")
    val scored = docs.join(
      importanceScores(docs, idCol, textCol, target, targetTextCol, k),
      idCol)
    val sig = lit(1.0) /
      (lit(1.0) + exp(-(col("llr_per_token") / lit(temperature))))
    val w = floor(sig * lit(1e6) + lit(0.5)) / lit(1e6)
    Sampling.weightedSample(scored.withColumn("__w", w), idCol, "__w",
      seed).drop("__w")
  }
}
