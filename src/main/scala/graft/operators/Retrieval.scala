package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Keyword retrieval over a document corpus: inverted-index postings,
  * smooth TF-IDF, and BM25 top-k search — the lexical complement to the
  * embedding ANN family (Similarity.scala). A training-data pipeline
  * uses these for corpus search, source triage, and keyword-conditioned
  * filtering where an embedding index is overkill.
  *
  * Scale design: everything is the inverted-index join shape; nothing is
  * ever pairwise. The query-term filter is a literal IN predicate applied
  * row-locally inside the token explode — BEFORE any shuffle — so a
  * query only ever shuffles its (doc, query-term) hits, never the
  * corpus-wide posting list. Per-term document frequency rides a window
  * over the already-aggregated postings (one sort shuffle on term, no
  * second execution of the tokenize subplan). Corpus statistics (N,
  * avgdl) are a broadcast 1-row frame; they re-scan only the projected
  * text column, which at corpus scale is cheaper than persisting the
  * tokenized corpus. Top-k is TakeOrdered — never a global window.
  *
  * Tokens are `\s+` splits of the trimmed, lowercased text — the same
  * definition as the dedup/shingle family, with exact DuckDB twins.
  */
object Retrieval {

  /** Inverted-index postings (doc, term, tf) — term frequency is the
    * raw occurrence count. `terms` narrows to a query set row-locally
    * (empty = the full index build: one explode + one shuffle). */
  def postings(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String] = Nil): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val hit =
      if (terms.isEmpty) tok else tok.filter(col("term").isin(terms: _*))
    hit.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
  }

  /** Smooth TF-IDF (the sklearn convention, so scores are comparable to
    * the de-facto standard): idf = ln((1+N)/(1+df)) + 1,
    * tfidf = tf * idf. One row per (doc, term). */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String,
            terms: Seq[String] = Nil): DataFrame = {
    val n = docs.agg(count(lit(1)).as("__n"))
    val tf = postings(docs, idCol, textCol, terms)
    // df as a window count over the (doc, term) postings: one sort
    // shuffle on term; a groupBy-then-join would re-execute the whole
    // tokenize subplan for the second reference
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))))
    withDf.crossJoin(broadcast(n))
      .withColumn("__idf",
        log((lit(1.0) + col("__n")) / (lit(1.0) + col("df"))) + lit(1.0))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        (col("tf") * col("__idf")).as("tfidf"))
  }

  /** BM25 top-k documents for a bag of query terms (Robertson/Sparck
    * Jones idf with the standard +1 floor; k1/b defaults are the
    * conventional 1.2/0.75).
    *
    * Per-document term scores are summed through DECIMAL(18,8) — decimal
    * addition is exact and order-independent, so the score (and the
    * top-k cut it decides) is bit-stable across partitionings and
    * engines (the repo's moneySum rule). Ties break on the id. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query term set")
    require(k > 0, s"bm25TopK: k must be positive, got $k")
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(lower(col(textCol))).as("__toks"))
    val stats = toks.agg(count(lit(1)).as("__n"),
      avg(size(col("__toks"))).as("__avgdl"))
    val hits = toks.select(col(idCol), size(col("__toks")).as("__dl"),
        explode(col("__toks")).as("__term"))
      .filter(col("__term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val withDf = hits.withColumn("__df",
      count(lit(1)).over(Window.partitionBy(col("__term"))))
    val scored = withDf.crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5)) + lit(1.0)))
      .withColumn("__s",
        col("__idf") * (col("__tf") * lit(k1 + 1.0)) /
          (col("__tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__s").cast("decimal(18,8)")).cast("double").as("score"))
      .sort(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (lexical BM25 list + vector ANN list -> one ranking):
    * score(doc) = sum over lists of 1 / (kRrf + rank), the rank-only
    * formula that needs no score calibration between lists. Rankings are
    * small per-query frames (top-k lists), so fusion is a union + one
    * tiny aggregation; contributions sum through DECIMAL(18,12) so the
    * fused order is bit-stable across engines. Ties break on the id. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String,
              rankCol: String = "rank", kRrf: Int = 60,
              topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no rankings to fuse")
    require(kRrf > 0 && topK > 0, "rrfFuse: kRrf and topK must be positive")
    rankings.map(_.select(col(idCol),
        (lit(1.0) / (lit(kRrf.toDouble) + col(rankCol).cast("double")))
          .as("__rrf")))
      .reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"),
        sum(col("__rrf").cast("decimal(18,12)")).cast("double")
          .as("rrf_score"))
      .sort(col("rrf_score").desc, col(idCol))
      .limit(topK)
  }

  /** Top-n distinctive terms per group (language, source, ...) — the
    * c-TF-IDF "what characterizes this slice" view a dataset card shows.
    * Group term count x smooth inverse GROUP frequency
    * (tf * (ln((1+G)/(1+df_g)) + 1), G = group count, df_g = groups
    * containing the term). The per-term group-frequency window partitions
    * hold at most G rows; the rank window partitions per group are
    * vocabulary-bounded. Ties break on the term. */
  def topTermsPerGroup(docs: DataFrame, groupCols: Seq[String],
                       textCol: String, n: Int): DataFrame = {
    require(groupCols.nonEmpty, "topTermsPerGroup needs group columns")
    require(n > 0, s"topTermsPerGroup: n must be positive, got $n")
    val g = docs.select(groupCols.map(col): _*).distinct()
      .agg(count(lit(1)).as("__g"))
    val tf = docs.select(groupCols.map(col) :+
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"): _*)
      .groupBy(groupCols.map(col) :+ col("term"): _*)
      .agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn("df_g",
      count(lit(1)).over(Window.partitionBy(col("term"))))
    withDf.crossJoin(broadcast(g))
      .withColumn("score", col("tf") *
        (log((lit(1.0) + col("__g")) / (lit(1.0) + col("df_g"))) +
          lit(1.0)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(groupCols.map(col): _*)
          .orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= n)
      .select(groupCols.map(col) ++
        Seq(col("term"), col("tf"), col("df_g"), col("score"),
          col("rank")): _*)
  }

  /** Pointwise-mutual-information collocations (Church & Hanks 1990):
    * adjacent token pairs whose joint frequency beats the independence
    * assumption — multi-word expressions ("new york", "machine
    * learning") a tokenizer/vocab builder or stopword auditor wants
    * surfaced from a corpus.
    *
    * The score emitted is the LOG-FREE PMI surrogate
    * `exp(PMI) = P(w1 w2) / (P(w1) P(w2))` — strictly monotone in PMI,
    * so ranking and thresholding are equivalent, while staying
    * engine-exact: IEEE division/multiplication are correctly rounded
    * everywhere, `ln` is libm-dependent in the last ulp. `pmi` (the
    * natural log) is included for human consumption; rank by
    * `pmi_ratio`.
    *
    * Scale shape: one token explode -> unigram counts (one shuffle), one
    * row-local bigram explode -> pair counts (one shuffle), corpus
    * totals as broadcast 1-row frames, then two vocabulary-keyed joins
    * to attach c(w1) and c(w2). `minCount` floors the pair count BEFORE
    * the joins, so rare-pair noise (the classic PMI failure mode) never
    * reaches the join stage. Top-k is TakeOrdered on (ratio desc, w1,
    * w2) — per-partition heaps, no global sort. */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
                      minCount: Long = 5L, topK: Int = 100): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = docs.select(
      TextFunctions.tokens(lower(col(textCol))).as("__t"))
    // persisted: the vocabulary frame feeds the c(w1) join, the c(w2)
    // join, and the corpus-total aggregate — without the barrier each
    // reference re-runs the corpus tokenize+count. Vocabulary-sized
    // (<< corpus). Cache lifetime: as Curation — fresh sessions per
    // gate run, or unpersist via spark.catalog
    val uni = toks.select(explode(col("__t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bigram total = tokens - non-null docs: every non-null text has
    // >= 1 token (a \s+ split is never empty), so each contributes
    // exactly len-1 adjacent pairs — no second corpus pass needed
    val totals = uni.agg(sum(col("c")).as("__n")).crossJoin(
      docs.agg(count(col(textCol)).as("__nd")))
    // adjacent pairs as "w1 w2" strings — tokens are \s+ splits, so the
    // space join is unambiguous; size guard keeps sequence() legal on
    // single-token docs
    val bigrams = toks.select(explode(when(size(col("__t")) >= 2,
        transform(sequence(lit(1), size(col("__t")) - 1),
          i => concat_ws(" ", element_at(col("__t"), i),
            element_at(col("__t"), i + 1))))
      .otherwise(array().cast("array<string>"))).as("bg"))
    val pairCnt = bigrams.groupBy(col("bg"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
    val ratio = ((col("pair_count").cast("double") * col("__n")) /
      col("c1")) * (col("__n").cast("double") / col("c2")) /
      (col("__n") - col("__nd")).cast("double")
    pairCnt
      .withColumn("w1", split_part(col("bg"), lit(" "), lit(1)))
      .withColumn("w2", split_part(col("bg"), lit(" "), lit(2)))
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("pair_count"), col("c1"),
        col("c2"), ratio.as("pmi_ratio"), log(ratio).as("pmi"))
      .sort(col("pmi_ratio").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Reciprocal rank @k per query — 1/position of the FIRST relevant
    * candidate under (score desc, id) order, 0 when no relevant lands
    * inside the cut (the no-hit convention that makes the mean over
    * queries the usual MRR). Same single query-key exchange as
    * [[ndcgAtK]]; 1/pos of an integer position is one division of
    * identical doubles — engine-exact without decimal plumbing. */
  def reciprocalRankAtK(scored: DataFrame, queryCols: Seq[String],
                        idCol: String, scoreCol: String, relCol: String,
                        k: Int): DataFrame = {
    require(queryCols.nonEmpty, "reciprocalRankAtK needs query keys")
    require(k > 0, s"reciprocalRankAtK: k must be positive, got $k")
    val q = queryCols.map(col)
    val byScore = Window.partitionBy(q: _*)
      .orderBy(col(scoreCol).desc, col(idCol))
    scored
      .withColumn("__pr", row_number().over(byScore).cast("long"))
      .groupBy(q: _*)
      .agg(min(when(col(relCol) > 0 && col("__pr") <= k, col("__pr")))
        .as("first_rel_rank"))
      .withColumn("rr",
        coalesce(lit(1.0) / col("first_rel_rank").cast("double"),
          lit(0.0)))
  }

  /** NDCG@k per query — the standard graded ranking-quality metric for
    * a retrieval stack (BM25 / vector / hybrid evaluation). Rank by
    * (score desc, id) for DCG, by (relevance desc, id) for the ideal;
    * gain = rel / log₂(pos + 1); ndcg = DCG / IDCG (NULL when the query
    * has no relevant candidates). One exchange on the query key with
    * two in-partition sorts — work is bounded by each query's candidate
    * pool, never the corpus. Per-position gains are summed through
    * DECIMAL(18,8): the quantization is engine-identical (same double
    * in, same decimal out), the sum exact and order-independent — so
    * the metric is bit-portable, at a harmless 1e-8 truncation of an
    * eval score. */
  def ndcgAtK(scored: DataFrame, queryCols: Seq[String], idCol: String,
              scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(queryCols.nonEmpty, "ndcgAtK needs query key columns")
    require(k > 0, s"ndcgAtK: k must be positive, got $k")
    val q = queryCols.map(col)
    val byScore = Window.partitionBy(q: _*)
      .orderBy(col(scoreCol).desc, col(idCol))
    val byRel = Window.partitionBy(q: _*)
      .orderBy(col(relCol).desc, col(idCol))
    def gain(pos: Column): Column =
      col(relCol).cast("double") /
        (log(pos.cast("double") + lit(1.0)) / log(lit(2.0)))
    def decSum(pos: Column): Column =
      sum(when(pos <= k, gain(pos).cast("decimal(18,8)"))
        .otherwise(lit(0).cast("decimal(18,8)"))).cast("double")
    scored
      .withColumn("__pr", row_number().over(byScore).cast("long"))
      .withColumn("__pi", row_number().over(byRel).cast("long"))
      .groupBy(q: _*)
      .agg(decSum(col("__pr")).as("dcg"), decSum(col("__pi")).as("idcg"),
        count(lit(1)).as("n_candidates"))
      .withColumn("ndcg",
        when(col("idcg") > 0.0, col("dcg") / col("idcg")))
  }
}
