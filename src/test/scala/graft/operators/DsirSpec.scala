package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec

class DsirSpec extends SparkSpec {

  test("importanceScores: hand-computed add-k unigram LLR") {
    val docs = df("doc_id BIGINT, text STRING",
      Row(1L, "good"), Row(2L, "bad"))
    val target = df("q STRING", Row("good"))
    val out = Dsir.importanceScores(docs, "doc_id", "text", target, "q")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // target model: good:1, Nt=1, Vt=1; raw model: good:1 bad:1, Nr=2,
    // Vr=2, k=0.5 -> llr(good) = ln(1.5/1.5) - ln(1.5/3) = ln 2;
    // llr(bad) = ln(0.5/1.5) - ln(1.5/3) = ln(2/3)
    assert(math.abs(out(1L) - math.log(2.0)) < 1e-9)
    assert(math.abs(out(2L) - math.log(2.0 / 3.0)) < 1e-9)
  }

  test("resample: deterministic across reruns; target-like docs " +
    "preferentially kept at low temperature") {
    // no per-doc unique tokens: a token unseen by the tiny target model
    // gets its add-k floor, which can EXCEED the raw probability of a
    // genuinely rare token — the classic small-target smoothing artifact
    // (it surfaced here first: unique tok$i suffixes made every doc
    // score target-like)
    val rows = (0L until 200L).map(i =>
      Row(i, if (i % 2 == 0) "alpha beta gamma" else "zzz yyy xxx"))
    val docs = df("doc_id BIGINT, text STRING", rows: _*)
    val target = df("q STRING", Row("alpha beta gamma"))
    def run() = Dsir.resample(docs, "doc_id", "text", target, "q",
        temperature = 0.2, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = run()
    assert(kept == run(), "resample must be rerun-deterministic")
    val evens = kept.count(_ % 2 == 0)
    val odds = kept.size - evens
    assert(evens > 80, s"target-like docs should mostly survive: $evens")
    assert(odds < 30, s"off-target docs should mostly drop: $odds")
    // score columns ride along on survivors
    val cols = Dsir.resample(docs, "doc_id", "text", target, "q",
      temperature = 0.2, seed = 7L).columns.toSet
    assert(Set("llr", "llr_per_token", "n_tokens").subsetOf(cols))
  }
}
