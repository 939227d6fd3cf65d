package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-statistical language-model scoring — the CCNet-style
  * "perplexity filter" a pretraining pipeline runs to rank documents by
  * how surprising they are under a model of the corpus itself: fit an
  * add-k-smoothed unigram model on the corpus, score each document by
  * its mean negative log-likelihood (high NLL = unusual / noisy text,
  * low NLL = fluent-for-this-corpus). A full KenLM is out of scope
  * offline; the unigram model keeps the exact pipeline shape (fit a
  * corpus model -> score every doc -> threshold) with engine-exact
  * arithmetic.
  *
  * Scale shape: the model fit is one (term -> count) aggregation; the
  * two scalar totals (token count N, vocab size V) aggregate that frame
  * to ONE broadcast row. Scoring re-tokenizes the corpus (a projected
  * row-local scan — cheaper at 100 TB than persisting the tokenized
  * corpus) and joins token hits against the vocab frame on the term key:
  * a standard shuffle join whose right side is the vocabulary, not the
  * corpus. Per-doc NLL sums run through DECIMAL(18,9) so scores are
  * bit-stable across partitionings and engines.
  */
object LmScore {

  /** The fitted unigram table (term, cnt) — exposed so a fit on one
    * corpus can score another (e.g. fit on trusted text, score a crawl). */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))

  /** Mean add-k-smoothed unigram NLL per document:
    * nll = -(1/n) * sum_t ln((cnt(t) + k) / (N + k * V)).
    * Unseen terms (when scoring a different corpus than the fit) get
    * cnt = 0 via the left join's coalesce. */
  def meanNll(docs: DataFrame, idCol: String, textCol: String,
              model: DataFrame, k: Double = 0.5): DataFrame = {
    require(k > 0, s"meanNll: smoothing k must be positive, got $k")
    val totals = model.agg(sum(col("cnt")).as("__n"),
      count(lit(1)).as("__v"))
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    toks.join(model, Seq("term"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        (-log((coalesce(col("cnt"), lit(0L)) + lit(k)) /
          (col("__n") + lit(k) * col("__v")))).as("__nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("__nll").cast("decimal(18,9)")).cast("double") /
          count(lit(1))).as("mean_nll"))
  }

  /** Fit-and-score on the same corpus — the common one-call form. */
  def scoreCorpus(docs: DataFrame, idCol: String, textCol: String,
                  k: Double = 0.5): DataFrame =
    meanNll(docs, idCol, textCol, unigramCounts(docs, textCol), k)

  /** Conditional bigram NLL — the actual LM-shape perplexity (token
    * probability conditioned on its predecessor), one rung below the
    * KenLM the reference pipelines run:
    *   p(t_i | t_{i-1}) = (c(t_{i-1} t_i) + k) / (c(t_{i-1}) + k * V)
    * with the document's FIRST token scored by the add-k unigram model
    * (the standard sentence-start fallback). Fit and score in one call
    * (the model is corpus-internal, like [[scoreCorpus]]).
    *
    * Scale shape: predecessor alignment is a lag window partitioned by
    * doc (bounded by doc length); bigram/unigram counts are term-keyed
    * aggregations; scoring joins hits against the two count frames on
    * their term keys — vocabulary-sized right sides, never the corpus. */
  def bigramScoreCorpus(docs: DataFrame, idCol: String, textCol: String,
                        k: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"bigramScoreCorpus: smoothing k must be positive, got $k")
    val toks = docs.select(col(idCol),
        posexplode(TextFunctions.tokens(lower(col(textCol)))))
      .withColumnRenamed("pos", "__pos")
      .withColumnRenamed("col", "__term")
      .withColumn("__prev", lag(col("__term"), 1)
        .over(Window.partitionBy(col(idCol)).orderBy(col("__pos"))))
    val uni = toks.groupBy(col("__term")).agg(count(lit(1)).as("__uc"))
    val bi = toks.filter(col("__prev").isNotNull)
      .groupBy(col("__prev"), col("__term"))
      .agg(count(lit(1)).as("__bc"))
    val totals = uni.agg(sum(col("__uc")).as("__n"),
      count(lit(1)).as("__v"))
    val scored = toks
      .join(bi, Seq("__prev", "__term"), "left")
      .join(uni.withColumnRenamed("__term", "__prev")
        .withColumnRenamed("__uc", "__pc"), Seq("__prev"), "left")
      .join(uni, Seq("__term"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        when(col("__prev").isNull,
          // first token: unigram fallback
          -log((coalesce(col("__uc"), lit(0L)) + lit(k)) /
            (col("__n") + lit(k) * col("__v"))))
        .otherwise(
          -log((coalesce(col("__bc"), lit(0L)) + lit(k)) /
            (coalesce(col("__pc"), lit(0L)) + lit(k) * col("__v"))))
        .as("__nll"))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("__nll").cast("decimal(18,9)")).cast("double") /
          count(lit(1))).as("mean_nll"))
  }
}
