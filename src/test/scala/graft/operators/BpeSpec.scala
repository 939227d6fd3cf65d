package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {

  private def docs(texts: String*) =
    df("doc_id BIGINT, text STRING",
      texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }: _*)

  test("wordCounts: lowercased corpus frequencies with code-point symbols") {
    val wc = Bpe.wordCounts(docs("Low low LOWER", "low"), "text")
      .orderBy("w").collect()
    assert(wc.map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSeq == Seq(("low", 3L, "l o w"), ("lower", 1L, "l o w e r")))
  }

  test("train: textbook low/lower/lowest merges with the lexicographic " +
    "tie-break") {
    val d = docs("low low low lower lowest")
    val ms = Bpe.train(d, "text", 4)
    assert(ms.map(m => (m.round, m.symA, m.symB, m.merged, m.pairCount)) ==
      Seq(
        (1, "l", "o", "lo", 5L),    // ties "l o"=5, "o w"=5 -> smaller pair
        (2, "lo", "w", "low", 5L),
        (3, "low", "e", "lowe", 2L),
        (4, "lowe", "r", "lower", 1L))) // ties at 1 -> "lowe r" smallest
  }

  test("mergeFold: left-to-right non-overlapping application") {
    val d = docs("aaaa")
    val out = d.select(Bpe.mergeFold(lit("a a a a"), "a", "a").as("s"))
      .head().getString(0)
    assert(out == "aa aa") // never "a aa a" / greedy re-merge of the merged symbol
  }

  test("train: merges never cross word boundaries and weight by corpus " +
    "frequency") {
    // "ab" appears in two words but "b a" is never adjacent across words.
    val d = docs("ab ab ab cd", "ab cd cd")
    val ms = Bpe.train(d, "text", 2)
    assert(ms.head.merged == "ab" && ms.head.pairCount == 4L)
    assert(ms(1).merged == "cd" && ms(1).pairCount == 3L)
  }

  test("train: deterministic under repartitioning") {
    val d = docs("spark scan sort merge join", "scan sort scan merge",
      "join join spark sort")
    val a = Bpe.train(d, "text", 5)
    val b = Bpe.train(d.repartition(7), "text", 5)
    assert(a == b)
  }

  test("applyMerges: segments with the learned table, unknown symbols " +
    "pass through") {
    val d = docs("low low low lower lowest")
    val ms = Bpe.train(d, "text", 4)
    val seg = docs("low lowest zap")
      .select(Bpe.applyMerges(col("text"), ms))
      .head().getString(0)
    assert(seg == "low | lowe s t | z a p")
  }

  test("trainDf: gate-surface frame matches the case-class result") {
    val d = docs("low low low lower lowest")
    val rows = Bpe.trainDf(spark, d, "text", 3).orderBy("round").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq ==
      Seq((1L, "l", "o", "lo", 5L), (2L, "lo", "w", "low", 5L),
        (3L, "low", "e", "lowe", 2L)))
  }

  test("train: requires at least one adjacent pair per round") {
    val d = docs("ab ab") // one merge exhausts: "ab" has no pairs left
    val ms = Bpe.train(d, "text", 1)
    assert(ms.head.merged == "ab")
    intercept[IllegalArgumentException] { Bpe.train(d, "text", 2) }
  }
}
