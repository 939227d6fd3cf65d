package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding merge learning (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-vocabulary trainer a data pipeline runs over its corpus
  * before model training. Learns the top-k most frequent adjacent
  * symbol merges; [[applyMerges]] segments text with the learned table.
  *
  * Scale design: ONE corpus tokenize pass builds the word-frequency
  * table; every later round works on that vocabulary-bounded frame
  * (<< corpus — exactly the word-dict formulation reference BPE
  * trainers use). Each round is: an adjacent-pair aggregation (one
  * vocab-sized shuffle), a single-ROW argmax collect (count desc, pair
  * asc — the deterministic tie-break), and a row-local fold applying
  * the merge. Rounds persist/unpersist the state frame like the k-means
  * loop (Clustering.scala) so round r doesn't re-execute rounds 1..r-1.
  *
  * Engine-portable by construction: symbols are code points (zero-width
  * split, never UTF-16 halves), symbols never contain spaces (words are
  * `\s+` tokens), and the merge application is a left-fold whose
  * accumulator is the space-joined merged prefix — the same fold DuckDB
  * replays via `list_reduce`, which is what puts the whole trainer
  * (pair counts, argmax, merge, next round) under the SQL oracle with
  * unrolled rounds. Left-to-right non-overlapping merge semantics
  * emerge from the fold: once a pair merges, the new symbol no longer
  * matches the pair's left side. No end-of-word marker (the Sennrich
  * `</w>` variant); merges never cross word boundaries because the
  * state is per-word.
  */
object Bpe {

  final case class Merge(round: Int, symA: String, symB: String,
                         merged: String, pairCount: Long)

  /** Code-point symbols of a token, space-joined. `split` on the empty
    * pattern advances one code point per match (a zero-width regex match
    * never lands inside a surrogate pair), and the filter drops the
    * zero-width edge artifacts the engine may emit. Equivalent to a
    * per-character `regexp_extract_all(w, ".")` scan, which this
    * replaces: that form inlined a regex-engine invocation PER CHARACTER
    * into the hashAgg whole-stage-codegen unit, blowing the Janino
    * compile (13k-line unit) and silently dropping the trainer to
    * interpreted execution. The HOF filter binds a lambda instead of
    * unrolling, so the generated unit stays small. */
  private[operators] def charSyms(tok: Column): Column =
    array_join(filter(split(tok, ""), s => s =!= ""), " ")

  /** Initial trainer state: one row per distinct lowercased token with
    * its corpus frequency and the space-joined code-point symbols. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(lower(col(textCol))))
        .as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms", charSyms(col("w")))

  /** Adjacent symbol pairs of one state row, as "a b" strings (the
    * q_pmi bigram shape — unambiguous because symbols have no spaces). */
  private def adjacentPairs(symsList: Column): Column =
    when(size(symsList) >= 2,
      transform(sequence(lit(1), size(symsList) - 1),
        i => concat_ws(" ", element_at(symsList, i),
          element_at(symsList, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** One merge application as a left-fold: accumulator = the merged
    * prefix, space-joined. Merge fires when the current symbol is `b`
    * and the accumulator's LAST symbol is `a` (exact: symbols cannot
    * contain spaces, so the " a" suffix test is whole-symbol). */
  private[operators] def mergeFold(syms: Column, a: String,
                                   b: String): Column = {
    val merged = a + b
    aggregate(split(syms, " "), lit(""),
      (acc, s) =>
        when(acc === "", s)
          .when(s === lit(b) && acc === lit(a), lit(merged))
          .when(s === lit(b) && endswith(acc, lit(" " + a)),
            concat(acc.substr(lit(1), length(acc) - lit(a.length)),
              lit(merged)))
          .otherwise(concat(acc, lit(" "), s)))
  }

  /** Learn `rounds` merges. Deterministic: ties in pair frequency break
    * to the lexicographically smaller "a b" pair. Throws if the corpus
    * runs out of adjacent pairs before `rounds` merges (every word
    * fully merged) — callers pick `rounds` << total pair mass. */
  def train(docs: DataFrame, textCol: String, rounds: Int,
            statePartitions: Int = 4): Seq[Merge] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(statePartitions >= 1,
      s"statePartitions must be >= 1, got $statePartitions")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the VOCAB frame (distinct tokens), not the corpus, is the round
    // state — orders of magnitude smaller than the scan that built it.
    // Left at the corpus shuffle width, every one of the ~rounds
    // sequential argmax jobs launches that many near-empty tasks, and
    // the 4->32-core strong-scaling probe measured wall time RISING
    // with cores on pure launch overhead. Coalesce once (narrow, no
    // shuffle); later withColumn rounds inherit the width. Callers with
    // genuinely huge vocabs raise `statePartitions`.
    var state = wordCounts(docs, textCol).coalesce(statePartitions)
      .persist(lvl)
    // deferred-unpersist round structure: ONE Spark job per round (the
    // argmax), not two. Round r's argmax both materializes state r's
    // cache and is the last reader of state r-1, so r-1 unpersists right
    // after it — an eager persist+count job per round would double the
    // fixed scheduler overhead that dominates when the vocab frame is
    // small (measured: the 4->32-core strong-scaling probe showed this
    // trainer's wall time RISING with cores on pure job overhead).
    var prev: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    for (r <- 1 to rounds) {
      val best = state
        .select(col("cnt"),
          explode(adjacentPairs(split(col("syms"), " "))).as("bg"))
        .groupBy(col("bg")).agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("bg")).limit(1)
        .collect()
      if (prev != null) { prev.unpersist(); prev = null }
      require(best.nonEmpty,
        s"corpus ran out of adjacent pairs at round $r")
      val bg = best.head.getString(0)
      val pc = best.head.getLong(1)
      val Array(a, b) = bg.split(" ", 2)
      merges += Merge(r, a, b, a + b, pc)
      if (r < rounds) {
        // the state after the FINAL merge has no reader — skip it
        val next = state.withColumn("syms",
          mergeFold(col("syms"), a, b)).persist(lvl)
        prev = state
        state = next
      }
    }
    state.unpersist()
    merges.toSeq
  }

  /** The learned merge table as a DataFrame (the q_bpe_train gate
    * surface). */
  def trainDf(spark: SparkSession, docs: DataFrame, textCol: String,
              rounds: Int): DataFrame = {
    import spark.implicits._
    train(docs, textCol, rounds).toDF()
      .select(col("round").cast("long").as("round"),
        col("symA").as("sym_a"), col("symB").as("sym_b"),
        col("merged"), col("pairCount").as("pair_count"))
  }

  /** Segment text with a learned merge table: per token, the code-point
    * symbols with each merge folded in order. Row-local (k chained
    * folds, no shuffle); returns the space-joined pieces per token,
    * tokens joined by " | ". */
  def applyMerges(text: Column, merges: Seq[Merge]): Column = {
    val segTok = (tok: Column) => merges.foldLeft(charSyms(tok)) {
      (s, m) => mergeFold(s, m.symA, m.symB)
    }
    array_join(transform(TextFunctions.tokens(lower(text)),
      t => segTok(t)), " | ").as("bpe_pieces")
  }
}
