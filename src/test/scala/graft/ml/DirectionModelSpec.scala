package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.domain.Features
import graft.fixtures.LobsterFixture

class DirectionModelSpec extends SparkSpec {

  private lazy val features = Features.hiddenExecFeatures(
    LobsterFixture.preppedDay(spark, nEvents = 3000)).cache()

  test("prepareTraining: label mapping and NaN scrub") {
    val prepped = DirectionModel.prepareTraining(features)
    val labels = prepped.select(col("label")).distinct().collect()
      .map(_.getDouble(0)).sorted
    assert(labels.sameElements(Array(0.0, 1.0)))
    // agg_ratio can be null on zero spread; after prep must be finite
    val bad = prepped.filter(isnan(col("agg_ratio")) ||
      col("agg_ratio").isNull).count()
    assert(bad == 0)
  }

  test("GBT pipeline learns the direction signal end-to-end") {
    val prepped = DirectionModel.prepareTraining(features)
    val (train, test) = DirectionModel.split(prepped, 0.25)
    val model = DirectionModel.gbtPipeline(maxIter = 5, maxDepth = 3)
      .fit(train)
    val preds = DirectionModel.attachPredictions(model, test)
    assert(preds.columns.contains("pred_dir") &&
      preds.columns.contains("pred_prob"))
    val dirs = preds.select(col("pred_dir")).distinct().collect()
      .map(_.getInt(0)).toSet
    assert(dirs.subsetOf(Set(-1, 1)))
    val probs = preds.select(col("pred_prob")).collect().map(_.getDouble(0))
    assert(probs.forall(p => p >= 0.0 && p <= 1.0))
    // the fixture's hidden execs at bid/ask carry direction signal via
    // agg_ratio; the model must beat coin-flip on train at least
    val trainPreds = DirectionModel.attachPredictions(model, train)
      .withColumn("prediction",
        when(col("pred_dir") === -1, 0.0).otherwise(1.0))
    val (acc, _) = DirectionModel.evaluate(trainPreds)
    assert(acc > 0.55, s"train accuracy $acc")
  }

  test("M9 report: classes with zero true positives still appear, with " +
    "sklearn's zero conventions") {
    import org.apache.spark.sql.Row
    // class 2 is labeled but never predicted correctly (or at all);
    // class 1 is predicted once but never labeled
    val preds = df("label DOUBLE, prediction DOUBLE",
      Row(0.0, 0.0), Row(0.0, 0.0), Row(2.0, 0.0), Row(2.0, 1.0))
    val rep = DirectionModel.classificationReport(preds).collect()
      .map(r => r.getDouble(0) -> r).toMap
    assert(rep.keySet == Set(0.0, 1.0, 2.0))
    assert(rep(2.0).getAs[Long]("tp") == 0L)
    assert(rep(2.0).getAs[Long]("support") == 2L)
    assert(rep(2.0).getAs[Double]("precision") == 0.0)
    assert(rep(2.0).getAs[Double]("recall") == 0.0)
    assert(rep(2.0).getAs[Double]("f1") == 0.0)
    assert(rep(1.0).getAs[Long]("support") == 0L)
    assert(rep(1.0).getAs[Double]("precision") == 0.0) // tp 0 of 1 predicted
    assert(rep(1.0).getAs[Double]("recall") == 0.0)    // no true rows
    assertApprox(rep(0.0).getAs[Double]("precision"), 2.0 / 3.0)
    assertApprox(rep(0.0).getAs[Double]("recall"), 1.0)
  }

  test("M9 report: predictions of a different numeric type than labels " +
    "are cast, not double-counted or schema-corrupted") {
    import org.apache.spark.sql.Row
    // IntegerType predictions against DoubleType labels: 1 and 1.0 must
    // be ONE class, and prediction-only classes must fit the label type
    val preds = df("label DOUBLE, prediction INT",
      Row(1.0, 1), Row(1.0, 1), Row(0.0, 1), Row(1.0, 2))
    val rep = DirectionModel.classificationReport(preds)
    val byClass = rep.collect().map(r => r.getDouble(0) -> r).toMap
    assert(byClass.keySet == Set(0.0, 1.0, 2.0))
    assert(byClass(1.0).getAs[Long]("tp") == 2L)
    assert(byClass(1.0).getAs[Long]("support") == 3L)
    assertApprox(byClass(1.0).getAs[Double]("precision"), 2.0 / 3.0)
    assert(byClass(2.0).getAs[Long]("support") == 0L) // prediction-only
  }

  test("M9 reporting: confusion matrix counts, per-class report on a " +
    "hand fixture, feature importances named and normalized") {
    import org.apache.spark.sql.Row
    // hand fixture: labels/preds chosen so precision != recall
    //   class 1: tp=2, fp=1 (pred 1, label 0), fn=1 -> p=2/3, r=2/3
    //   class 0: tp=3, fp=1, fn=1
    val preds = df("label DOUBLE, prediction DOUBLE",
      Row(1.0, 1.0), Row(1.0, 1.0), Row(1.0, 0.0),
      Row(0.0, 0.0), Row(0.0, 0.0), Row(0.0, 0.0), Row(0.0, 1.0))
    val cm = DirectionModel.confusionMatrix(preds).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(cm == Map((1.0, 1.0) -> 2L, (1.0, 0.0) -> 1L,
      (0.0, 0.0) -> 3L, (0.0, 1.0) -> 1L))
    val rep = DirectionModel.classificationReport(preds).collect()
      .map(r => r.getDouble(0) ->
        ((r.getAs[Double]("precision"), r.getAs[Double]("recall")))).toMap
    assertApprox(rep(1.0)._1, 2.0 / 3.0)
    assertApprox(rep(1.0)._2, 2.0 / 3.0)
    assertApprox(rep(0.0)._1, 3.0 / 4.0)
    assertApprox(rep(0.0)._2, 3.0 / 4.0)
    // importances from a real fitted GBT: one weight per feature, a
    // probability vector over features
    val prepped = DirectionModel.prepareTraining(features)
    val model = DirectionModel.gbtPipeline(maxIter = 3, maxDepth = 3)
      .fit(prepped)
    val imp = DirectionModel.featureImportances(model)
    assert(imp.map(_._1) == DirectionModel.DefaultFeatures)
    assert(imp.forall(_._2 >= 0.0))
    assertApprox(imp.map(_._2).sum, 1.0, 1e-6)
  }

  test("logistic pipeline runs and emits calibrated-ish probabilities") {
    val prepped = DirectionModel.prepareTraining(features)
    val model = DirectionModel.logisticPipeline().fit(prepped)
    val preds = DirectionModel.attachPredictions(model, prepped)
    val probs = preds.select(avg(col("pred_prob"))).collect()(0).getDouble(0)
    assert(probs > 0.05 && probs < 0.95)
  }

  test("rocAuc: hand AUC with ties counting half; one-class group is " +
    "NULL; perfect separation is 1.0") {
    def rows(g: String, ps: Seq[(Double, Long)]) =
      ps.map { case (p, l) => org.apache.spark.sql.Row(g, p, l) }
    val d = df("seg STRING, p DOUBLE, label BIGINT",
      (rows("a", Seq(0.1 -> 0L, 0.4 -> 0L, 0.4 -> 1L, 0.8 -> 1L)) ++
        rows("b", Seq(0.2 -> 1L, 0.3 -> 1L)) ++
        rows("c", Seq(0.1 -> 0L, 0.2 -> 0L, 0.9 -> 1L))): _*)
    val out = DirectionModel.rocAuc(d, "p", "label", Seq("seg"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Any]("auc")))).toMap
    // group a: pairs (pos, neg): (0.4,0.1)=1, (0.4,0.4)=0.5, (0.8,0.1)=1,
    // (0.8,0.4)=1 -> AUC = 3.5/4
    assert(out("a")._1 == 2L && out("a")._2 == 2L)
    assert(approx(out("a")._3.asInstanceOf[Double], 3.5 / 4))
    assert(out("b")._3 == null)       // no negatives
    assert(out("c")._3.asInstanceOf[Double] == 1.0)
  }

  test("calibrationBins: bin edges, top-bin fold, counts, exact means") {
    val rows = Seq(
      (0.05, 0L), (0.05, 1L),          // bin 0: frac_pos 0.5
      (0.10, 0L),                      // exactly on an edge -> bin 1
      (0.55, 1L), (0.575, 1L),         // bin 5
      (1.0, 1L))                       // p = 1.0 folds into bin 9
      .zipWithIndex.map { case ((p, l), i) =>
        org.apache.spark.sql.Row(i.toLong, p, l) }
    val d = df("id BIGINT, p DOUBLE, label BIGINT", rows: _*)
    val out = DirectionModel.calibrationBins(d, "p", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out.keySet == Set(0L, 1L, 5L, 9L))
    assert(out(0L) == ((2L, 1L, 0.05, 0.5)))
    assert(out(1L) == ((1L, 0L, 0.10, 0.0)))
    assert(out(5L)._1 == 2L && out(5L)._2 == 2L)
    assert(approx(out(5L)._3, 0.5625) && out(5L)._4 == 1.0)
    assert(out(9L) == ((1L, 1L, 1.0, 1.0)))
  }

  test("cohenKappa: textbook two-rater fixture, perfect agreement, " +
    "degenerate single-cell NULL") {
    import org.apache.spark.sql.Row
    def rows(l: String, p: String, k: Int) =
      Seq.fill(k)(Row(l, p))
    // 20 AA, 5 AB, 10 BA, 15 BB: po = 0.7, pe = 0.5, kappa = 0.4
    val d = df("l STRING, p STRING",
      (rows("A", "A", 20) ++ rows("A", "B", 5) ++
        rows("B", "A", 10) ++ rows("B", "B", 15)): _*)
    val r = DirectionModel.cohenKappa(d, "l", "p").collect()(0)
    assert(r.getLong(0) == 50L)
    assertApprox(r.getDouble(1), 0.7)
    assertApprox(r.getDouble(2), 0.5)
    assertApprox(r.getDouble(3), 0.4)
    // perfect agreement over two classes: po = 1, kappa = 1
    val perfect = df("l STRING, p STRING",
      (rows("A", "A", 3) ++ rows("B", "B", 2)): _*)
    val rp = DirectionModel.cohenKappa(perfect, "l", "p").collect()(0)
    assertApprox(rp.getDouble(1), 1.0)
    assertApprox(rp.getDouble(3), 1.0)
    // degenerate: every row in ONE cell -> pe = 1, kappa undefined
    val deg = df("l STRING, p STRING", rows("A", "A", 4): _*)
    val rd = DirectionModel.cohenKappa(deg, "l", "p").collect()(0)
    assert(rd.isNullAt(3))
  }

  test("calibrationBins: out-of-range p clamps to edge bins, NULL p " +
    "groups under a NULL bin row (nothing silent)") {
    val d = df("id BIGINT, p DOUBLE, label BIGINT",
      org.apache.spark.sql.Row(0L, -0.3, 0L),   // below 0 -> bin 0
      org.apache.spark.sql.Row(1L, 1.7, 1L),    // above 1 -> bin 9
      org.apache.spark.sql.Row(2L, null, 1L),   // NULL -> NULL bin
      org.apache.spark.sql.Row(3L, 0.42, 1L))   // in-domain unaffected
    val out = DirectionModel.calibrationBins(d, "p", "label")
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
          ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == Set(Some(0L), Some(9L), Some(4L), None))
    assert(out(Some(0L)) == ((1L, 0L)))
    assert(out(Some(9L)) == ((1L, 1L)))
    assert(out(None) == ((1L, 1L)))
    assert(out(Some(4L)) == ((1L, 1L)))
  }
}
