package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy vocabulary matching: all term pairs within Levenshtein
  * distance `maxDist` (1 or 2), found without an all-pairs scan via
  * symmetric-delete blocking (Garbe's SymSpell algorithm, public).
  *
  * Principle: if lev(a, b) <= d, an optimal alignment leaves a common
  * subsequence reachable from BOTH terms by at most d single-character
  * deletions — so the delete-<=d neighborhoods (term itself included)
  * intersect. Blocking on neighborhood keys therefore has recall 1;
  * an exact `levenshtein` verify on the candidates removes the false
  * positives (sharing a deleted form does not bound the distance).
  *
  * Scale: runs over the VOCABULARY (one corpus tokenize+distinct
  * pass), not the corpus — |V| rows, each emitting 1 + L + L(L-1)/2
  * keys for maxDist 2 (term length L; ~60 keys for typical words).
  * The candidate join is a plain equi-join on the key; candidates are
  * deduped before the verify so each pair pays one levenshtein. For
  * vocabularies with very long tokens the key count grows O(L²) —
  * SymSpell's prefix-truncation variant bounds it at the cost of
  * boundary-shift recall; left out here to keep the operator exact.
  */
object FuzzyMatch {

  /** One-deletion results of `w` (positions 1..L). */
  private def del1(w: Column, i: Column, len: Column): Column =
    concat(w.substr(lit(1), i - 1), w.substr(i + 1, len))

  /** Delete-neighborhood of `w` up to `maxDeletes` in {1, 2}, the term
    * itself included, deduped. Row-local. */
  private[operators] def deleteVariants(w: Column, maxDeletes: Int): Column = {
    val len = length(w)
    val d1 = transform(sequence(lit(1), len), i => del1(w, i, len))
    val d2 = flatten(transform(sequence(lit(1), len), i =>
      when(i < len, transform(sequence(i + 1, len), j =>
        concat(w.substr(lit(1), i - 1), w.substr(i + 1, j - i - 1),
          w.substr(j + 1, len))))
        .otherwise(array().cast("array<string>"))))
    val all =
      if (maxDeletes >= 2) concat(array(w), d1, d2) else concat(array(w), d1)
    array_distinct(all)
  }

  /** All unordered term pairs with lev <= maxDist. `vocab` must hold
    * DISTINCT terms in `termCol` (non-null, non-empty); other columns
    * are ignored — join them back on the returned terms. Returns
    * (term_a, term_b, dist) with term_a < term_b. */
  def editPairs(vocab: DataFrame, termCol: String, maxDist: Int): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"symmetric-delete blocking implemented for maxDist 1 or 2, got $maxDist")
    val keys = vocab
      .select(col(termCol).as("__term"),
        explode(deleteVariants(col(termCol), maxDist)).as("__k"))
    val a = keys.select(col("__term").as("term_a"), col("__k"))
    val b = keys.select(col("__term").as("term_b"), col("__k"))
    a.join(b, Seq("__k"))
      .where(col("term_a") < col("term_b"))
      .select("term_a", "term_b").distinct()
      .withColumn("dist",
        levenshtein(col("term_a"), col("term_b")).cast("long"))
      .where(col("dist") <= maxDist)
  }
}
