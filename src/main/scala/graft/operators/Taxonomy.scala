package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Keyword-taxonomy tagging: route every document to content categories
  * by lexicon hits — the cheap topic router real curation pipelines run
  * before anything model-based (domain mixing wants "how much code vs
  * prose vs math", and a broadcast keyword lexicon answers that at scan
  * speed). The lexicon lives in the plan as array literals, so the
  * whole operator is row-local codegen'd Column work: ZERO shuffles,
  * no UDF, no join — it rides the scan's own partitioning at any corpus
  * size.
  *
  * Deterministic tie policy: the winning category is the one with the
  * most keyword-token hits, ties to the lexicographically smaller
  * category name, and docs with zero hits in every category get
  * 'none' — rerun/layout stable by construction since every decision is
  * a pure function of the row.
  */
object Taxonomy {

  /** One row per input row: the id, one `cnt_<category>` hit count per
    * category (multiset counts — a keyword appearing 3 times scores 3),
    * and `top_category`. Tokens are lowercased `\s+` splits, matching
    * the corpus-wide tokenizer; keywords should be supplied lowercase. */
  def tagCategories(docs: DataFrame, idCol: String, textCol: String,
                    categories: Seq[(String, Seq[String])]): DataFrame = {
    require(categories.nonEmpty, "need at least one category")
    require(categories.map(_._1).distinct.size == categories.size,
      s"category names must be unique: ${categories.map(_._1)}")
    require(categories.forall(_._2.nonEmpty), "every category needs keywords")
    val ltoks = TextFunctions.tokens(lower(col(textCol)))
    // coalesce: a NULL text must count 0 and route to 'none', not leak
    // NULL counts into the argmax struct sort
    val cntCols = categories.map { case (cat, kws) =>
      coalesce(size(filter(ltoks, t => t.isin(kws: _*))), lit(0))
        .as(s"cnt_$cat")
    }
    val counted = docs.select(col(idCol) +: cntCols: _*)
    val maxCnt = categories.map(c => col(s"cnt_${c._1}"))
      .reduce((a, b) => greatest(a, b))
    // argmax with ties-to-smaller-name: sort (neg count, name) structs —
    // struct ordering compares fields left to right, so the head is the
    // largest count, alphabetical within ties
    val ranked = array_sort(array(categories.map { case (cat, _) =>
      struct((-col(s"cnt_$cat")).as("__neg"), lit(cat).as("__cat"))
    }: _*))
    counted.withColumn("top_category",
      when(maxCnt <= 0, lit("none"))
        .otherwise(element_at(ranked, 1).getField("__cat")))
  }
}
