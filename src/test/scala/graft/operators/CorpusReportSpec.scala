package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec

class CorpusReportSpec extends SparkSpec {

  // group a: 3 docs, one exact dup pair; group b: 1 doc
  private def corpus() = df("doc_id BIGINT, g STRING, text STRING",
    Row(1L, "a", "the quick brown fox"),
    Row(2L, "a", "the quick brown fox"),
    Row(3L, "a", "a lazy dog sleeps here"),
    Row(4L, "b", "short one"))

  test("report: volumes, exact-dup load, quality mass per group in one " +
    "pass; stable under repartitioning") {
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusReport.report(d, Seq("g"), "doc_id", "text")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getDouble(5))).toMap
    val m = run(corpus())
    assert(m("a")._1 == 3L) // n_docs
    assert(m("a")._2 == 4L + 4L + 5L, "token sum") // tokens
    assert(m("a")._3 == 19L + 19L + 22L, "char sum") // chars
    assert(m("a")._4 == 1L, "doc 2 is the non-winner of its md5 group")
    assert(m("b") == (1L, 2L, 9L, 0L, m("b")._5))
    m.values.foreach { case (_, _, _, _, q) =>
      assert(q >= 0.0 && q <= 1.0, s"quality mean out of range: $q") }
    assert(m == run(corpus().repartition(5)), "report drifts under layout")
  }
}
