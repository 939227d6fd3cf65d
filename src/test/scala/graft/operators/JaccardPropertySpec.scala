package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.SparkSpec

/** Property differential for the PPJoin pipeline (prefix + length +
  * positional filter + exact verification): many GENERATED corpora with
  * skewed token frequencies, planted near-dups, and sub-shingle-length
  * docs, all run through ONE `jaccardPairs` invocation with the corpus
  * id as a BLOCK column — the blockCols × positional-filter interaction
  * is the riskiest composition (the filter's min-rank bound must hold
  * within every block independently) — and compared against a
  * driver-side brute force per corpus at four thresholds. DedupSpec's
  * hand and single-corpus differentials pin the basics; this pins the
  * candidate-pruning algebra across corpus shapes a fixture can miss.
  */
class JaccardPropertySpec extends SparkSpec {

  private def shingleSet(s: String): Set[String] = {
    val toks = s.toLowerCase.trim.split("\\s+").toVector
    if (toks.size < 3) Set.empty
    else (0 to toks.size - 3).map(i =>
      toks.slice(i, i + 3).mkString(" ")).toSet
  }

  test("jaccardPairs (blocked) == per-corpus brute force over 25 " +
    "generated corpora at four thresholds") {
    val words = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu",
      "hen", "ibis", "jay", "kit", "lark")
    val genCorpus: Gen[Seq[String]] = for {
      vocabN <- Gen.choose(4, words.size)
      nDocs <- Gen.choose(10, 30)
      // zipf-ish skew: low word indexes drawn far more often, so the
      // document-frequency profile is skewed and rarity order + the
      // positional filter actually prune
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.frequency(1 -> Gen.choose(1, 2), // sub-shingle docs
          9 -> Gen.choose(3, 18))
        toks <- Gen.listOfN(len,
          Gen.frequency((1 to vocabN).map(i =>
            (vocabN - i + 1) -> Gen.const(words(i - 1))): _*))
      } yield toks.mkString(" "))
    } yield docs
    // deterministic draw: fixed seed, 25 corpora
    val seed0 = rng.Seed(20260816L)
    val corpora: Seq[Seq[String]] = (0 until 25).map { i =>
      genCorpus(Gen.Parameters.default, seed0.reseed(i.toLong)).get
    }
    // near-dup plants: first doc of each corpus re-emitted with one
    // trailing token swapped (high-Jaccard pair the filters must keep)
    val rows: Seq[(String, Long, String)] = corpora.zipWithIndex.flatMap {
      case (docs, c) =>
        val base = docs.zipWithIndex.map { case (t, i) =>
          (s"c$c", (c * 1000 + i).toLong, t)
        }
        val t0 = docs.head.split(" ")
        val dup = (s"c$c", (c * 1000 + 999).toLong,
          (t0.dropRight(1) :+ "newt").mkString(" "))
        base :+ dup
    }
    val d = df("corpus STRING, doc_id BIGINT, text STRING",
      rows.map(r => Row(r._1, r._2, r._3)): _*)
    val sets: Map[Long, Set[String]] =
      rows.map { case (_, id, t) => id -> shingleSet(t) }.toMap
    val byCorpus: Map[String, Seq[Long]] =
      rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for (t <- Seq(0.25, 0.45, 0.7, 0.85)) {
      val got = Dedup.jaccardPairs(d, "doc_id", "text", 3, t,
          blockCols = Seq("corpus")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val expect = (for {
        ids <- byCorpus.values.toSeq
        ia <- ids; ib <- ids
        if ia < ib && sets(ia).nonEmpty && sets(ib).nonEmpty
        inter = sets(ia).intersect(sets(ib)).size.toDouble
        j = inter / (sets(ia).size + sets(ib).size - inter)
        if j >= t
      } yield (ia, ib) -> j).toMap
      assert(got.keySet == expect.keySet,
        s"t=$t missing=${(expect.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- expect.keySet).take(5)}")
      expect.foreach { case (k, j) => assertApprox(got(k), j) }
    }
  }
}
