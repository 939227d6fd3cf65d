package graft.domain

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.fixtures.LobsterFixture
import graft.ml.DirectionModel

/** EP1 stages 3-4 composed with a REAL model: train the direction
  * classifier, attach predictions, apply outside-spread overrides, feed
  * the probability-weighted OI family (the reference's central data
  * flow: prediction_ML_pipeline.py -> order_imbalance.py). */
class MlToOiSpec extends SparkSpec {

  test("model probabilities flow into the weighted OI panel") {
    val day = LobsterFixture.preppedDay(spark, nEvents = 2500)
    val features = Features.hiddenExecFeatures(day)
    val train = DirectionModel.prepareTraining(features)
    val model = DirectionModel.logisticPipeline().fit(train)
    val scored = Features.applyOutsideSpreadTag(
      DirectionModel.attachPredictions(model, train))

    // every hidden exec carries a probability in [0,1]; outside-spread
    // rows are forced to exactly 0/1
    val probs = scored.select(min(col("pred_prob")), max(col("pred_prob")))
      .collect()(0)
    assert(probs.getDouble(0) >= 0.0 && probs.getDouble(1) <= 1.0)
    val forced = scored.filter(col("agg_ratio") <= 0.0)
      .select(col("pred_prob")).distinct().collect().map(_.getDouble(0))
    assert(forced.forall(_ == 0.0))

    // hid panel over the scored rows: join predictions back onto the full
    // event frame (J2 shape) and aggregate
    val withProb = Features.addMicrostructure(day)
      .join(scored.select(col("ticker"), col("date"), col("seq"),
        col("pred_prob"), col("pred_dir")),
        Seq("ticker", "date", "seq"), "left")
      .withColumn("pred_prob", coalesce(col("pred_prob"), lit(0.5)))
    val panel = Oi.densifyPanel(
      Oi.panel(withProb, 5L * 60 * 1000000000L, "hid"),
      5L * 60 * 1000000000L)
    assert(panel.count() == 65)
    val ois = panel.select(col("order_imbalance_hid")).collect()
      .map(_.getDouble(0))
    assert(ois.forall(v => v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12))

    // agg panel with the model's pred_dir
    val aggPanel = Oi.panel(withProb
      .withColumn("pred_dir", coalesce(col("pred_dir"), lit(1))), 0L, "agg")
    assert(aggPanel.count() == 1)
  }
}
