package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec

class TaxonomySpec extends SparkSpec {

  private val lex: Seq[(String, Seq[String])] = Seq(
    "alpha" -> Seq("apple", "avocado"),
    "beta"  -> Seq("banana", "berry"),
    "gamma" -> Seq("grape"))

  private def run(rows: Row*): Map[Long, (Int, Int, Int, String)] =
    Taxonomy.tagCategories(
        df("doc_id BIGINT, text STRING", rows: _*), "doc_id", "text", lex)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .toMap

  test("multiset counts and plain argmax") {
    val m = run(
      Row(1L, "apple banana apple grape"),
      Row(2L, "banana berry banana"))
    assert(m(1L) == ((2, 1, 1, "alpha")))
    assert(m(2L) == ((0, 3, 0, "beta")))
  }

  test("ties go to the lexicographically smaller category name") {
    val m = run(
      Row(1L, "apple banana"),          // alpha==beta==1 -> alpha
      Row(2L, "banana grape"),          // beta==gamma==1 -> beta
      Row(3L, "apple banana grape"))    // three-way tie -> alpha
    assert(m(1L)._4 == "alpha")
    assert(m(2L)._4 == "beta")
    assert(m(3L)._4 == "alpha")
  }

  test("zero hits, empty text, and NULL text all route to 'none' with " +
    "zero counts") {
    val m = run(
      Row(1L, "nothing matches here"),
      Row(2L, ""),
      Row(3L, null))
    Seq(1L, 2L, 3L).foreach { id =>
      assert(m(id) == ((0, 0, 0, "none")), s"doc $id -> ${m(id)}")
    }
  }

  test("matching is case-insensitive and whitespace-tokenized; " +
    "punctuation-glued words do not match") {
    val m = run(
      Row(1L, "APPLE\tBanana\n grape"),
      Row(2L, "apple, banana."))       // "apple," is not the token "apple"
    assert(m(1L) == ((1, 1, 1, "alpha")))
    assert(m(2L) == ((0, 0, 0, "none")))
  }

  test("non-ASCII keywords and text match exactly") {
    val uLex = Seq("cyr" -> Seq("привет"), "greek" -> Seq("λόγος"))
    val got = Taxonomy.tagCategories(
        df("doc_id BIGINT, text STRING",
          Row(1L, "ΛΌΓΟΣ λόγος x"), Row(2L, "Привет мир")),
        "doc_id", "text", uLex)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got(1L) == "greek")
    assert(got(2L) == "cyr")
  }

  test("degenerate lexicons are rejected") {
    val d = df("doc_id BIGINT, text STRING", Row(1L, "x"))
    intercept[IllegalArgumentException] {
      Taxonomy.tagCategories(d, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Taxonomy.tagCategories(d, "doc_id", "text",
        Seq("a" -> Seq("x"), "a" -> Seq("y")))
    }
    intercept[IllegalArgumentException] {
      Taxonomy.tagCategories(d, "doc_id", "text",
        Seq("a" -> Seq.empty))
    }
  }
}
