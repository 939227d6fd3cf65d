package graft.ml

import graft.{SparkEntry, SparkSpec}

/** The M1-M3 driver gates are rows-only (training is not
  * SQL-expressible), so THIS spec is their correctness pin: deterministic
  * across reruns (fixed seeds, hash split, constant event cap) and above
  * the planted-signal accuracy bar — the reference's own sanity check
  * (chunk_pipeline.py:82). */
class MlGatesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_m1_gbt: beats the planted signal and is rerun-stable") {
    val a = SparkEntry.queries("q_m1_gbt")(spark, sf).collect()
    val b = SparkEntry.queries("q_m1_gbt")(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "gbt gate not deterministic across reruns")
    assert(a.length == 1)
    val r = a.head
    assert(r.getAs[Boolean]("beats_planted"), s"gbt below planted bar: $r")
    assert(r.getAs[Long]("n_train") > 0 && r.getAs[Long]("n_test") > 0)
  }

  test("q_m2_predict: both directions predicted, unit-interval probs, " +
    "rerun-stable") {
    val a = SparkEntry.queries("q_m2_predict")(spark, sf).collect()
    val b = SparkEntry.queries("q_m2_predict")(spark, sf).collect()
    assert(a.sortBy(_.getInt(0)).toSeq == b.sortBy(_.getInt(0)).toSeq,
      "predict gate not deterministic across reruns")
    assert(a.map(_.getInt(0)).toSet == Set(-1, 1))
    assert(a.forall(_.getAs[Boolean]("prob_in_unit")))
  }

  test("q_m3_rf_lr: RF grid-CV and LR both beat the planted signal") {
    val rows = SparkEntry.queries("q_m3_rf_lr")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("rf", "lr"))
    assert(rows.forall(_.getAs[Boolean]("beats_planted")),
      s"below planted bar: ${rows.mkString("; ")}")
  }
}
