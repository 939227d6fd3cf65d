package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class FuzzyMatchSpec extends SparkSpec {

  private def vocab(ws: String*) =
    df("w STRING", ws.map(Row(_)): _*)

  private def pairs(v: org.apache.spark.sql.DataFrame, d: Int) =
    FuzzyMatch.editPairs(v, "w", d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("deleteVariants: all delete-1 and delete-2 forms plus the term") {
    val out = vocab("abc")
      .select(FuzzyMatch.deleteVariants(col("w"), 2).as("v"))
      .head().getSeq[String](0).toSet
    assert(out == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
  }

  test("distance-1 edit kinds all pair up: sub, insert, delete, boundary") {
    val got = pairs(vocab("scan", "span", "scans", "can", "xscan"), 1)
    assert(got == Set(
      ("scan", "span", 1L),   // substitution
      ("scan", "scans", 1L),  // insert at end
      ("can", "scan", 1L),    // delete at front
      ("scan", "xscan", 1L))) // insert at front
  }

  test("maxDist=2 differential vs naive all-pairs on a pseudorandom vocab") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcd"
    val terms = (1 to 120).map(_ =>
      (1 to (3 + rnd.nextInt(4))).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString).distinct
    val v = vocab(terms: _*)
    for (d <- Seq(1, 2)) {
      val naive = v.as("a").crossJoin(v.as("b"))
        .where(col("a.w") < col("b.w") &&
          levenshtein(col("a.w"), col("b.w")) <= d)
        .select(col("a.w"), col("b.w"),
          levenshtein(col("a.w"), col("b.w")).cast("long"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(pairs(v, d) == naive, s"maxDist=$d")
    }
  }

  test("single-character vocabulary: delete to empty string still blocks") {
    assert(pairs(vocab("a", "b", "ab"), 1) ==
      Set(("a", "b", 1L), ("a", "ab", 1L), ("ab", "b", 1L)))
  }
}
