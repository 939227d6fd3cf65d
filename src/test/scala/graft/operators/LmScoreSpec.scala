package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec

class LmScoreSpec extends SparkSpec {

  // corpus: "a a a b" -> N=4, V=2; counts a=3, b=1
  private def corpus() = df("doc_id BIGINT, text STRING",
    Row(1L, "a a a"), Row(2L, "b"))

  test("scoreCorpus matches the hand add-k formula; repeated common " +
    "tokens score lower NLL than rare ones") {
    val k = 0.5
    val n = 4.0; val v = 2.0
    def lp(cnt: Double): Double = -math.log((cnt + k) / (n + k * v))
    def dec9(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val out = LmScore.scoreCorpus(corpus(), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L)
    assertApprox(out(1L)._2,
      ((dec9(lp(3)) + dec9(lp(3)) + dec9(lp(3))) / 3).toDouble, 1e-8)
    assertApprox(out(2L)._2, dec9(lp(1)).toDouble, 1e-8)
    assert(out(1L)._2 < out(2L)._2,
      "the common token must be less surprising than the rare one")
  }

  test("meanNll with a foreign model: unseen terms take the k-smoothed " +
    "zero count, never null") {
    val model = LmScore.unigramCounts(corpus(), "text")
    val other = df("doc_id BIGINT, text STRING", Row(9L, "zzz a"))
    val r = LmScore.meanNll(other, "doc_id", "text", model)
      .collect().head
    assert(r.getLong(1) == 2L)
    val k = 0.5; val n = 4.0; val v = 2.0
    def lp(cnt: Double): Double = -math.log((cnt + k) / (n + k * v))
    def dec9(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assertApprox(r.getDouble(2),
      ((dec9(lp(0)) + dec9(lp(3))) / 2).toDouble, 1e-8)
  }

  test("bigramScoreCorpus matches the hand conditional formula with " +
    "unigram fallback on first tokens") {
    // corpus: "a b a b" + "b a" -> N=6, V=2, uni a=3 b=3, bi (a,b)=2 (b,a)=2
    val d = df("doc_id BIGINT, text STRING",
      Row(1L, "a b a b"), Row(2L, "b a"))
    val k = 0.5
    def dec9(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val first = -math.log((3 + k) / (6 + k * 2))      // unigram a or b
    val cond = -math.log((2 + k) / (3 + k * 2))       // any seen bigram
    val out = LmScore.bigramScoreCorpus(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out(1L)._1 == 4L && out(2L)._1 == 2L)
    assertApprox(out(1L)._2,
      ((dec9(first) + dec9(cond) * 3) / 4).toDouble, 1e-8)
    assertApprox(out(2L)._2,
      ((dec9(first) + dec9(cond)) / 2).toDouble, 1e-8)
  }

  test("scores are stable under repartitioning (DECIMAL sums)") {
    val a = LmScore.scoreCorpus(corpus(), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = LmScore.scoreCorpus(corpus().repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b)
  }
}
