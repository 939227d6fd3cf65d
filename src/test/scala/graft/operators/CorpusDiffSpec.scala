package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec

class CorpusDiffSpec extends SparkSpec {

  private def snap(rows: (Long, String, String)*) =
    df("doc_id BIGINT, text STRING, source STRING",
      rows.map(r => Row(r._1, r._2, r._3)): _*)

  test("diff: added / removed / changed / unchanged, all four") {
    val old = snap((1L, "alpha", "web"), (2L, "beta", "web"),
      (3L, "gamma", "book"))
    val neu = snap((2L, "beta", "web"), (3L, "gamma EDITED", "book"),
      (4L, "delta", "web"))
    val got = CorpusDiff.diff(old, neu, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("churn: per-source counts; a doc that moves groups counts under " +
    "its NEW group") {
    val old = snap((1L, "a", "web"), (2L, "b", "web"), (3L, "c", "web"))
    val neu = snap((1L, "a", "web"), (2L, "b", "book"), // moved groups
      (4L, "d", "book"))
    val got = CorpusDiff.churn(old, neu, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("web", "unchanged") -> 1L,
      ("book", "unchanged") -> 1L, // doc 2, new group wins
      ("web", "removed") -> 1L, // doc 3 rolls up under its old group
      ("book", "added") -> 1L))
  }

  test("identical snapshots diff to all-unchanged") {
    val s = snap((1L, "x", "w"), (2L, "y", "w"))
    val st = CorpusDiff.diff(s, s, "doc_id", "text").collect()
      .map(_.getString(1)).distinct
    assert(st.sameElements(Array("unchanged")))
  }

  test("distributionDrift: hand-computed JS contributions; a vanished " +
    "source stays finite; identical mixtures drift zero") {
    // old mix: web 3/4, book 1/4. new mix: web 1/2, news 1/2 (book gone,
    // news appeared)
    val old = snap((1L, "a", "web"), (2L, "b", "web"), (3L, "c", "web"),
      (4L, "d", "book"))
    val neu = snap((1L, "a", "web"), (5L, "e", "news"))
    val got = CorpusDiff.distributionDrift(old, neu, "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    def js(p: Double, q: Double): Double = {
      val m = (p + q) / 2
      def t(x: Double) = if (x > 0) x * math.log(x / m) else 0.0
      (t(p) + t(q)) / 2
    }
    assert(got("web")._1 == 3L && got("web")._2 == 1L)
    assert(math.abs(got("web")._5 - js(0.75, 0.5)) < 1e-12)
    assert(math.abs(got("book")._5 - js(0.25, 0.0)) < 1e-12)
    assert(math.abs(got("news")._5 - js(0.0, 0.5)) < 1e-12)
    // all contributions finite, total inside [0, ln 2]
    val total = got.values.map(_._5).sum
    assert(total > 0 && total <= math.log(2) + 1e-12)
    // identical mixtures -> all contributions exactly zero
    val same = CorpusDiff.distributionDrift(old, old, "source")
      .collect().map(_.getDouble(5))
    assert(same.forall(_ == 0.0))
  }

  test("embeddingDrift: unchanged group -> cos 1 / L2 0; rotated group " +
    "drifts; group missing from a side -> count 0, null distances") {
    val old = df("g STRING, v ARRAY<DOUBLE>",
      Row("a", Seq(1.0, 0.0)), Row("a", Seq(1.0, 0.0)),
      Row("b", Seq(1.0, 0.0)), Row("b", Seq(0.0, 1.0)),
      Row("gone", Seq(2.0, 2.0)))
    val neu = df("g STRING, v ARRAY<DOUBLE>",
      Row("a", Seq(1.0, 0.0)),               // same centroid (1, 0)
      Row("b", Seq(0.0, 1.0)), Row("b", Seq(0.0, 1.0)), // (.5,.5)->(0,1)
      Row("fresh", Seq(3.0, 4.0)))
    val got = CorpusDiff.embeddingDrift(old, neu, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("a", "b", "gone", "fresh"))
    val a = got("a")
    assert(a.getLong(1) == 2L && a.getLong(2) == 1L)
    assert(a.getDouble(3) == 1.0 && a.getDouble(4) == 0.0)
    val b = got("b")  // (0.5, 0.5) vs (0, 1): cos = 1/sqrt(2)
    assert(math.abs(b.getDouble(3) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(math.abs(b.getDouble(4) - math.sqrt(0.5)) < 1e-12)
    assert(got("gone").getLong(2) == 0L && got("gone").isNullAt(3) &&
      got("gone").isNullAt(4))
    assert(got("fresh").getLong(1) == 0L && got("fresh").isNullAt(3))
  }
}
