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
    "rerun-stable (per-row face since r17)") {
    val a = SparkEntry.queries("q_m2_predict")(spark, sf).collect()
    val b = SparkEntry.queries("q_m2_predict")(spark, sf).collect()
    assert(a.sortBy(_.getLong(0)).toSeq == b.sortBy(_.getLong(0)).toSeq,
      "predict gate not deterministic across reruns")
    assert(a.map(_.getAs[Int]("pred_dir")).toSet == Set(-1, 1))
    assert(a.forall { r =>
      val p = r.getAs[Long]("prob_micro"); p >= 0L && p <= 1000000L
    })
    // the planted signal is learnable: most per-row decisions correct
    val acc = a.count(_.getAs[Boolean]("correct")).toDouble / a.length
    assert(acc >= 0.8, s"per-row accuracy $acc below the planted bar")
  }

  test("q_m3_rf_lr: RF grid-CV and LR both beat the planted signal, " +
    "CV selects the deep tree on the XOR interaction, rerun-stable") {
    val a = SparkEntry.queries("q_m3_rf_lr")(spark, sf).collect()
    val b = SparkEntry.queries("q_m3_rf_lr")(spark, sf).collect()
    assert(a.sortBy(_.getString(0)).toSeq == b.sortBy(_.getString(0)).toSeq,
      "rf/lr gate not deterministic across reruns")
    assert(a.map(_.getString(0)).toSet == Set("rf", "lr"))
    assert(a.forall(_.getAs[Boolean]("beats_planted")),
      s"below planted bar: ${a.mkString("; ")}")
    // the ACTUAL model selection: a depth-1 stump is chance on the XOR
    // fixture, so CV over {1, 5} must pick 5 — a tie-free grid is what
    // makes "CV machinery works" a falsifiable claim
    val rf = a.find(_.getString(0) == "rf").get
    assert(rf.getAs[Long]("chosen_depth") == 5L,
      s"CV failed to select the interaction-capable depth: $rf")
  }

  test("GBT ranks the planted signal feature FIRST in featureImportances " +
    "with a dominant share") {
    import org.apache.spark.sql.functions._
    // f_sig carries the label's sign by construction (the q_m1 fixture
    // shape); f_n1/f_n2 are hash noise — a learner that actually fit the
    // planted signal must attribute nearly all split gain to f_sig
    val cols = Seq("f_sig", "f_n1", "f_n2")
    val base = spark.range(0, 1024).select(col("id"),
      (pmod(col("id") * 2654435761L, lit(1000)) / 1000.0 - 0.5).as("h"))
    val planted = base
      .withColumn("direction", when(col("h") > 0, 1).otherwise(-1))
      .withColumn("f_sig", col("direction") * (abs(col("h")) + 1.0))
      .withColumn("f_n1", pmod(col("id") * 40503L, lit(1000)) / 1000.0)
      .withColumn("f_n2", pmod(col("id"), lit(7)).cast("double"))
    val prep = DirectionModel.prepareTraining(planted, cols)
    val model = DirectionModel.gbtPipeline(cols,
      maxDepth = 3, maxIter = 5, subsample = 1.0).fit(prep)
    val imp = DirectionModel.featureImportances(model, cols)
    val top = imp.maxBy(_._2)
    assert(top._1 == "f_sig",
      s"planted signal not the top importance: $imp")
    assert(top._2 > 0.8,
      s"planted signal share should dominate the noise decoys: $imp")
  }

  test("logistic pred_prob is CALIBRATED on the planted fixture: " +
    "high-probability bins are enriched in positives") {
    import org.apache.spark.sql.functions._
    // the q_m2 gate only pins range/domain; this rides the q_calibration
    // machinery (calibrationBins) to pin that the probabilities MEAN
    // something — on a cleanly separable planted signal the top-half
    // bins must be overwhelmingly positive and the bottom-half negative
    val cols = Seq("f1", "f2")
    val base = spark.range(0, 1000).select(col("id"),
      (pmod(col("id") * 2654435761L, lit(1000)) / 1000.0 - 0.5).as("f1"),
      (pmod(col("id") * 40503L, lit(1000)) / 1000.0 - 0.5).as("f2"))
    val planted = base
      .withColumn("direction",
        when(col("f1") * 2.0 + col("f2") > 0, 1).otherwise(-1))
      .withColumn("is_test", pmod(col("id"), lit(4)) === 0)
    val prep = DirectionModel.prepareTraining(planted, cols)
    val model = DirectionModel.logisticPipeline(cols)
      .fit(prep.filter(!col("is_test")))
    val preds = DirectionModel.attachPredictions(
      model, prep.filter(col("is_test")))
    val bins = DirectionModel
      .calibrationBins(preds, "pred_prob", "label", nBins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (hiN, hiPos) = bins.filter(_._1 >= 5)
      .foldLeft((0L, 0L)) { case ((n, p), b) => (n + b._2, p + b._3) }
    val (loN, loPos) = bins.filter(_._1 < 5)
      .foldLeft((0L, 0L)) { case ((n, p), b) => (n + b._2, p + b._3) }
    assert(hiN > 0 && loN > 0, s"both probability halves populated: ${bins.toSeq}")
    val hiRate = hiPos.toDouble / hiN
    val loRate = loPos.toDouble / loN
    assert(hiRate > 0.9 && loRate < 0.1,
      s"probabilities not calibrated on the separable planted signal: " +
        s"hi=$hiRate lo=$loRate bins=${bins.toSeq}")
  }

  test("two GBT fits on the same split yield the identical confusion " +
    "matrix; every test row is predicted; labels remap to {-1,+1} only") {
    import org.apache.spark.sql.functions._
    // planted two-sided signal: direction = sign of a linear combo the
    // model can recover; features are hash-derived (deterministic)
    val base = spark.range(0, 400).select(
      col("id"),
      (pmod(col("id") * 2654435761L, lit(1000)) / 1000.0 - 0.5).as("f1"),
      (pmod(col("id") * 40503L, lit(1000)) / 1000.0 - 0.5).as("f2"))
    val planted = base
      .withColumn("direction",
        when(col("f1") * 2.0 + col("f2") > 0, 1).otherwise(-1))
      .withColumn("is_test", pmod(col("id"), lit(4)) === 0)
    val prep = DirectionModel.prepareTraining(planted, Seq("f1", "f2"))
    val train = prep.filter(!col("is_test"))
    val test = prep.filter(col("is_test"))
    val nTest = test.count()
    def fitConfusion(): Seq[(Int, Int, Long)] = {
      val m = DirectionModel.gbtPipeline(Seq("f1", "f2"),
        maxDepth = 3, maxIter = 5, subsample = 1.0).fit(train)
      val preds = DirectionModel.attachPredictions(m, test)
      assert(preds.count() == nTest, "a prediction row per test row")
      assert(preds.select("pred_dir").distinct().collect()
        .map(_.getInt(0)).toSet.subsetOf(Set(-1, 1)),
        "pred_dir must remap to the {-1,+1} domain")
      DirectionModel.confusionMatrix(preds, "direction", "pred_dir")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    }
    val c1 = fitConfusion()
    val c2 = fitConfusion()
    assert(c1 == c2,
      s"fixed-seed GBT refit changed the confusion matrix:\n$c1\nvs\n$c2")
    assert(c1.map(_._3).sum == nTest, "confusion counts cover all rows")
  }
}
