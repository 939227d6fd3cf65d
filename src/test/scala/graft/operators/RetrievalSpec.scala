package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec

class RetrievalSpec extends SparkSpec {

  // N = 3 docs, avgdl = (3 + 2 + 4) / 3 = 3.0
  private def corpus() = df("doc_id BIGINT, text STRING",
    Row(1L, "apple banana apple"),
    Row(2L, "banana cherry"),
    Row(3L, "cherry cherry cherry apple"))

  test("postings: raw per-doc term frequencies, query filter applied " +
    "before aggregation") {
    val p = Retrieval.postings(corpus(), "doc_id", "text",
        Seq("apple", "cherry"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(p == Set((1L, "apple", 2L), (3L, "apple", 1L),
      (2L, "cherry", 1L), (3L, "cherry", 3L)))
  }

  test("tfIdf matches the sklearn smooth-idf formula") {
    val rows = Retrieval.tfIdf(corpus(), "doc_id", "text", Seq("apple"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    val idf = math.log((1.0 + 3.0) / (1.0 + 2.0)) + 1.0
    assert(rows.keySet == Set(1L, 3L))
    assert(rows(1L)._1 == 2L && rows(1L)._2 == 2L)
    assertApprox(rows(1L)._3, 2.0 * idf)
    assertApprox(rows(3L)._3, 1.0 * idf)
  }

  test("bm25TopK matches the reference formula, ranks by score with id " +
    "tie-break, and honors k") {
    val (k1, b) = (1.2, 0.75)
    val idf = math.log((3.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0) // df=2 both
    def term(tf: Long, dl: Long): Double =
      idf * (tf * (k1 + 1.0)) /
        (tf + k1 * ((1.0 - b) + b * dl / 3.0))
    def dec8(x: Double): BigDecimal =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val expected = Map( // doc -> (n_terms, decimal-summed score)
      1L -> (1L, dec8(term(2, 3)).toDouble),
      2L -> (1L, dec8(term(1, 2)).toDouble),
      3L -> (2L, (dec8(term(1, 4)) + dec8(term(3, 4))).toDouble))
    val out = Retrieval.bm25TopK(corpus(), "doc_id", "text",
        Seq("apple", "cherry"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 3)
    out.foreach { case (id, nTerms, score) =>
      assert(nTerms == expected(id)._1, s"doc $id n_terms")
      assertApprox(score, expected(id)._2)
    }
    // descending by score (doc 3 hits two terms, one of them 3 times)
    assert(out.head._1 == 3L)
    assert(out.map(_._3).toSeq.sliding(2).forall {
      case Seq(a, bb) => a >= bb; case _ => true })
    // k truncates
    assert(Retrieval.bm25TopK(corpus(), "doc_id", "text",
      Seq("apple", "cherry"), k = 1).count() == 1)
  }

  test("rrfFuse: rank-only fusion matches the hand formula, rewards " +
    "presence in both lists, ties break on id") {
    val lex = df("doc_id BIGINT, rank INT",
      Row(10L, 1), Row(20L, 2), Row(30L, 3))
    val sem = df("doc_id BIGINT, rank INT",
      Row(20L, 1), Row(40L, 2), Row(10L, 3))
    def r(rank: Int): BigDecimal =
      BigDecimal(1.0 / (60.0 + rank))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val expected = Map(
      10L -> (2L, (r(1) + r(3)).toDouble),
      20L -> (2L, (r(2) + r(1)).toDouble),
      30L -> (1L, r(3).toDouble),
      40L -> (1L, r(2).toDouble))
    val out = Retrieval.rrfFuse(Seq(lex, sem), "doc_id", topK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 4)
    out.foreach { case (id, n, s) =>
      assert(n == expected(id)._1, s"doc $id n_lists")
      assertApprox(s, expected(id)._2)
    }
    // both-list docs outrank single-list docs; 20 (ranks 2+1) == 10
    // (ranks 1+3) in formula? r(2)+r(1) > r(1)+r(3) -> 20 first
    assert(out.head._1 == 20L && out(1)._1 == 10L)
    assert(Retrieval.rrfFuse(Seq(lex, sem), "doc_id", topK = 2)
      .count() == 2)
  }

  test("topTermsPerGroup: distinctive terms outrank shared ones at equal " +
    "tf (c-TF-IDF), rank capped at n") {
    val d = df("doc_id BIGINT, g STRING, text STRING",
      Row(1L, "a", "zebra zebra the the"),
      Row(2L, "b", "yak yak the the"))
    val out = Retrieval.topTermsPerGroup(d, Seq("g"), "text", n = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(5)) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // G = 2; unique term: tf 2, df_g 1 -> 2*(ln(3/2)+1) > shared 2*1
    assert(out(("a", 1))._1 == "zebra" && out(("a", 1))._3 == 1L)
    assert(out(("b", 1))._1 == "yak")
    assert(out(("a", 2))._1 == "the" && out(("a", 2))._3 == 2L)
    assert(out.size == 4, "rank must cap at n per group")
  }

  test("bm25TopK: terms absent from the corpus contribute no rows; " +
    "empty query fails fast") {
    assert(Retrieval.bm25TopK(corpus(), "doc_id", "text",
      Seq("durian"), k = 5).count() == 0)
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus(), "doc_id", "text", Nil)
    }
  }

  test("pmiCollocations: ratio formula, minCount floor, top-k with " +
    "(w1, w2) tie-break") {
    val docs = df("doc_id BIGINT, text STRING",
      Row(1L, "new york is big"),
      Row(2L, "new york new york"),
      Row(3L, "big apple"))
    // N = 10 tokens, 3 docs -> Nb = 7 adjacent pairs
    val only = Retrieval.pmiCollocations(docs, "doc_id", "text",
      minCount = 2, topK = 10).collect()
    assert(only.length == 1, "minCount=2 must keep only 'new york'")
    val r = only.head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ("new", "york", 3L, 3L, 3L))
    val ratio = (3.0 * 10 / 3) * (10.0 / 3) / 7
    assertApprox(r.getDouble(5), ratio)
    assertApprox(r.getDouble(6), math.log(ratio))
    // minCount=1, k=3: 'big apple' and 'is big' tie at 50/7 (w1 breaks
    // it), 'new york' and 'york is' tie next — the cut lands mid-tie
    val top = Retrieval.pmiCollocations(docs, "doc_id", "text",
        minCount = 1, topK = 3)
      .collect().map(x => (x.getString(0), x.getString(1))).toSeq
    assert(top == Seq("big" -> "apple", "is" -> "big", "new" -> "york"),
      s"got $top")
  }

  test("ndcgAtK: hand-computed DCG/IDCG, cutoff at k, no-relevant " +
    "query NULL, perfect ranking 1.0") {
    import org.apache.spark.sql.Row
    // qa: rels at score-ranks 1,3 of 4 -> DCG = 1/log2(2) + 1/log2(4)
    //     IDCG = 1/log2(2) + 1/log2(3)
    val d = df("qid STRING, doc BIGINT, score DOUBLE, rel INT",
      Row("qa", 1L, 9.0, 1), Row("qa", 2L, 8.0, 0),
      Row("qa", 3L, 7.0, 1), Row("qa", 4L, 6.0, 0),
      Row("qb", 1L, 5.0, 0), Row("qb", 2L, 4.0, 0),
      Row("qc", 1L, 3.0, 1), Row("qc", 2L, 2.0, 0))
    val out = Retrieval.ndcgAtK(d, Seq("qid"), "doc", "score", "rel",
        k = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getAs[Any]("ndcg")))).toMap
    def q(x: Double) =
      new java.math.BigDecimal(x).setScale(8,
        java.math.RoundingMode.HALF_UP).doubleValue()
    // k=2 cutoff: qa's rank-3 relevant doc contributes to NEITHER dcg
    // (score rank 3 > 2) NOR idcg (ideal rank 2 <= 2 — wait, ideal
    // rank of the second relevant IS 2, inside the cut)
    val dcgA = q(1.0 / (math.log(2.0) / math.log(2.0)))
    val idcgA = dcgA + q(1.0 / (math.log(3.0) / math.log(2.0)))
    assert(approx(out("qa")._1, dcgA, 1e-7))
    assert(approx(out("qa")._2, idcgA, 1e-7))
    assert(approx(out("qa")._3.asInstanceOf[Double], dcgA / idcgA, 1e-7))
    assert(out("qb")._3 == null)
    assert(out("qc")._3.asInstanceOf[Double] == 1.0)
  }

  test("reciprocalRankAtK: first-relevant position, cutoff, and the " +
    "0.0 no-hit convention") {
    import org.apache.spark.sql.Row
    val d = df("qid STRING, doc BIGINT, score DOUBLE, rel INT",
      Row("qa", 1L, 9.0, 0), Row("qa", 2L, 8.0, 1), Row("qa", 3L, 7.0, 1),
      Row("qb", 1L, 5.0, 0), Row("qb", 2L, 4.0, 0),
      Row("qc", 1L, 3.0, 0), Row("qc", 2L, 2.0, 0), Row("qc", 3L, 1.0, 1))
    val out = Retrieval.reciprocalRankAtK(d, Seq("qid"), "doc", "score",
        "rel", k = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Any]("first_rel_rank"), r.getDouble(2)))).toMap
    assert(out("qa") == ((2L, 0.5)))
    assert(out("qb") == ((null, 0.0)))       // nothing relevant
    assert(out("qc") == ((null, 0.0)))       // relevant exists, beyond k
  }
}
