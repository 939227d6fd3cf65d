package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression,
  RandomForestClassifier}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator,
  MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hidden-execution direction classifier (SURVEY §2.9 M1-M4, M9;
  * `/root/reference/chunk_pipeline.py:26-96`,
  * `/root/reference/prediction_ML_pipeline.py:265-302`).
  *
  * The reference trains XGBoost / RandomForest / LogisticRegression on
  * type-5 rows to predict `direction` (its chunked warm-start loop is a
  * single-machine memory workaround — Spark ML fits whole-data in one
  * distributed pass, SURVEY §4.1). Labels: direction ∈ {-1, +1} maps to
  * {0, 1} (`chunk_pipeline.py:63-64`); predictions map back and
  * `pred_prob` = P(label 1) feeds the weighted-OI family (A2).
  */
object DirectionModel {

  val DefaultFeatures: Seq[String] = Seq(
    "ofi", "agg_ratio", "bid_pref", "hid_at_bid", "hid_at_ask",
    "prev_dir_1", "next_dir_1", "prev_dir_3", "next_dir_3",
    "prev_dir_4", "next_dir_4", "sent_prev", "sent_next", "size")

  /** Assemble features + binary label (direction -1 -> 0.0, +1 -> 1.0).
    * NaN/inf scrub mirrors `chunk_pipeline.py:325-326` (P7). */
  def prepareTraining(features: DataFrame,
                      cols: Seq[String] = DefaultFeatures): DataFrame = {
    val clean = cols.foldLeft(features) { (d, c) =>
      d.withColumn(c,
        when(isnan(col(c).cast("double")) ||
          abs(col(c).cast("double")) === Double.PositiveInfinity, 0.0)
          .otherwise(coalesce(col(c).cast("double"), lit(0.0))))
    }
    clean.withColumn("label",
      when(col("direction") === -1, 0.0).otherwise(1.0))
  }

  /** M1: gradient-boosted trees (the XGBoost analog), full pipeline. */
  def gbtPipeline(cols: Seq[String] = DefaultFeatures,
                  maxDepth: Int = 6, maxIter: Int = 20,
                  stepSize: Double = 0.1, subsample: Double = 0.8)
      : Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("features_raw")
      .setHandleInvalid("keep")
    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features")
    val gbt = new GBTClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxDepth(maxDepth).setMaxIter(maxIter)
      .setStepSize(stepSize).setSubsamplingRate(subsample)
    new Pipeline().setStages(Array(assembler, scaler, gbt))
  }

  /** M3: RandomForest / LogisticRegression with cross-validated grids
    * (`prediction_ML_pipeline.py:265-302`). The grid is parameterized so
    * a smoke gate can run a 1-point grid where the reference's full
    * 2x2 search would dominate a benchmark pass. */
  def rfCrossValidated(cols: Seq[String] = DefaultFeatures,
                       folds: Int = 3,
                       numTrees: Array[Int] = Array(50, 100),
                       maxDepths: Array[Int] = Array(5, 10))
      : CrossValidator = {
    val assembler = new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("features")
      .setHandleInvalid("keep")
    val rf = new RandomForestClassifier()
      .setLabelCol("label").setFeaturesCol("features")
    val pipe = new Pipeline().setStages(Array(assembler, rf))
    val grid = new ParamGridBuilder()
      .addGrid(rf.numTrees, numTrees)
      .addGrid(rf.maxDepth, maxDepths)
      .build()
    new CrossValidator().setEstimator(pipe)
      .setEvaluator(new BinaryClassificationEvaluator()
        .setLabelCol("label"))
      .setEstimatorParamMaps(grid).setNumFolds(folds).setParallelism(4)
  }

  def logisticPipeline(cols: Seq[String] = DefaultFeatures): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("features_raw")
      .setHandleInvalid("keep")
    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features")
      .setWithMean(true)
    val lr = new LogisticRegression()
      .setLabelCol("label").setFeaturesCol("features").setMaxIter(100)
    new Pipeline().setStages(Array(assembler, scaler, lr))
  }

  /** M2: predictions back to the domain convention — pred_dir ∈ {-1, +1}
    * (`chunk_pipeline.py:154-157`), pred_prob = P(class 1) (prob of a
    * seller-initiated hidden exec, matching A2's weighting). */
  def attachPredictions(model: PipelineModel, df: DataFrame): DataFrame = {
    val p1 = udf((v: Vector) => v(1))
    model.transform(df)
      .withColumn("pred_prob", p1(col("probability")))
      .withColumn("pred_dir",
        when(col("prediction") === 0.0, -1).otherwise(1))
      .drop("features_raw", "features", "rawPrediction", "probability",
        "prediction")
  }

  /** M4: train/test split (`train_test_split(test_size=.25)`). */
  def split(df: DataFrame, testSize: Double = 0.25, seed: Long = 42L)
      : (DataFrame, DataFrame) = {
    val Array(tr, te) = df.randomSplit(Array(1.0 - testSize, testSize), seed)
    (tr, te)
  }

  /** M9: confusion matrix as a (label, prediction, n) frame
    * (`EDA_ML.ipynb` cells 11-16) — one groupBy, nothing collected.
    * Predictions are cast to the label column's type first: the report
    * built on these counts types its `class` field from the labels, so an
    * IntegerType prediction of a LongType label would otherwise produce
    * rows violating that schema, and equal values of different boxed
    * types (1 vs 1L) would double-count as distinct classes. */
  def confusionMatrix(predictions: DataFrame,
                      labelCol: String = "label",
                      predCol: String = "prediction"): DataFrame =
    predictions.groupBy(col(labelCol),
        col(predCol).cast(predictions.schema(labelCol).dataType).as(predCol))
      .agg(count(lit(1)).as("n"))

  /** M9 extension: calibration (reliability) table — `nBins` equal-width
    * bins of the predicted probability vs the empirical positive rate,
    * the standard "is 0.8 really 80%?" diagnostic behind Platt scaling /
    * isotonic recalibration decisions. ONE partial-aggregated groupBy to
    * ≤ nBins rows; p = 1.0 folds into the top bin.
    *
    * `mean_p` divides a plain double sum: when the caller's probability
    * column lives on a dyadic grid (hash-derived scores, quantized model
    * outputs), every partial sum is exact and the result is
    * order-independent and engine-portable; for free-form doubles it
    * carries the usual summation-order ulp noise — micro-round before
    * gating on it.
    *
    * The probability column's domain is non-null p ∈ [0, 1]; out-of-range
    * values clamp into the edge bins (a miscalibrated-but-finite score
    * still lands in a diagnosable bin) and a NULL p groups under a NULL
    * bin row rather than vanishing — both visible, neither silent. */
  def calibrationBins(predictions: DataFrame, probCol: String,
                      labelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val p = col(probCol).cast("double")
    predictions
      // the isNotNull guard matters: least/greatest SKIP nulls in Spark,
      // so without it a NULL p would clamp silently into an edge bin
      .groupBy(when(p.isNotNull, greatest(lit(0L),
          least(floor(p * nBins), lit(nBins - 1L)))).cast("long")
        .as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        sum(p).as("__sum_p"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("__sum_p") / col("n")).as("mean_p"),
        (col("n_pos").cast("double") / col("n")).as("frac_pos"))
  }

  /** M9 extension: ROC-AUC by the Mann–Whitney identity — AUC =
    * U / (n⁺·n⁻) with tie-averaged ranks, i.e. the probability a random
    * positive out-scores a random negative (ties count half). Exact,
    * no curve discretization; rides [[graft.operators.DistTests
    * .mannWhitneyU]]'s ordered-window machinery: ONE shuffle on
    * (group, score order), nothing collected. `groupCols` keys per-slice
    * AUCs (per-source, per-segment model monitoring); a slice whose
    * labels are all one class yields NULL (no pairs to order). */
  def rocAuc(predictions: DataFrame, probCol: String, labelCol: String,
             groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "rocAuc needs group columns (use a constant column for global AUC)")
    val tagged = predictions.withColumn("__cls",
      when(col(labelCol) > 0, "pos").otherwise("neg"))
    graft.operators.DistTests
      .mannWhitneyU(tagged, groupCols, "__cls", "pos", probCol)
      .select(groupCols.map(col) ++ Seq(
        col("n_a").as("n_pos"), col("n_b").as("n_neg"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("u_stat") / (col("n_a") * col("n_b")).cast("double"))
          .as("auc")): _*)
  }

  /** M9 extension: Cohen's kappa — chance-corrected agreement between
    * two label columns, κ = (p_o − p_e)/(1 − p_e) with p_o the observed
    * agreement rate and p_e the marginal-product chance rate. The
    * standard one-number check for rater/model agreement beyond raw
    * accuracy (and for annotation-quality audits between two labeling
    * runs). ONE corpus shuffle: the (label, pred) confusion counts;
    * totals and both marginals are derived from that ≤ classes² frame.
    * Returns one row: `n`, `po`, `pe`, `kappa` (NULL when p_e = 1 —
    * degenerate single-cell agreement has no chance correction). */
  def cohenKappa(predictions: DataFrame, labelCol: String,
                 predCol: String): DataFrame = {
    val cm = confusionMatrix(predictions, labelCol, predCol)
      .withColumnRenamed(labelCol, "__l")
      .withColumnRenamed(predCol, "__p")
      .localCheckpoint() // tiny; referenced by four derivations below
    val tot = cm.agg(sum(col("n")).as("__n"),
      coalesce(sum(when(col("__l") === col("__p"), col("n"))), lit(0L))
        .as("__agree"))
    val rowM = cm.groupBy(col("__l").as("__c"))
      .agg(sum(col("n")).as("__nl"))
    val colM = cm.groupBy(col("__p").as("__c"))
      .agg(sum(col("n")).as("__np"))
    // marginal products and n*n in DOUBLE, not LONG: at ~3e9+ rows the
    // LONG products silently wrap (non-ANSI) and pe comes out wrong with
    // no error; pe only needs double precision, and at test scale the
    // integer-valued doubles are exact, so the oracle hash is unchanged
    val chance = rowM.join(colM, Seq("__c"))
      .agg(coalesce(sum(col("__nl").cast("double") * col("__np")),
        lit(0.0)).as("__ee"))
    tot.crossJoin(chance)
      .select(col("__n").as("n"),
        (col("__agree").cast("double") / col("__n")).as("po"),
        (col("__ee") / (col("__n").cast("double") * col("__n")))
          .as("pe"))
      .withColumn("kappa",
        when(col("pe") < 1.0,
          (col("po") - col("pe")) / (lit(1.0) - col("pe"))))
  }

  /** M9: per-class precision / recall / F1 from the confusion counts
    * (sklearn classification_report shape, including its zero conventions:
    * a class never predicted correctly still appears, with precision 0
    * when it was never predicted, recall 0 when it has no true rows, and
    * f1 0 when precision + recall is 0). The class list is the union of
    * observed labels and observed predictions, so no class silently drops
    * out of the report.
    *
    * ONE aggregation scan of the predictions: the O(classes^2) confusion
    * counts are collected and the report is assembled driver-side (the
    * olsByGroup pattern — referencing the confusion subplan from several
    * derived frames would rescan the full predictions once per
    * reference). */
  def classificationReport(predictions: DataFrame,
                           labelCol: String = "label",
                           predCol: String = "prediction"): DataFrame = {
    val cm = confusionMatrix(predictions, labelCol, predCol)
    val spark = predictions.sparkSession
    val rows = cm.collect() // classes^2 rows
    val support = rows.groupBy(_.get(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val ptot = rows.groupBy(_.get(1)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val tp = rows.filter(r => r.get(0) == r.get(1))
      .map(r => r.get(0) -> r.getLong(2)).toMap
    val classes = (support.keySet ++ ptot.keySet).toSeq
    val out = classes.map { c =>
      val t = tp.getOrElse(c, 0L)
      val s = support.getOrElse(c, 0L)
      val p = ptot.getOrElse(c, 0L)
      val prec = if (p > 0) t.toDouble / p else 0.0
      val rec = if (s > 0) t.toDouble / s else 0.0
      val f1 = if (prec + rec > 0) 2.0 * prec * rec / (prec + rec) else 0.0
      org.apache.spark.sql.Row(c, prec, rec, t, s, f1)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("class",
        cm.schema(labelCol).dataType),
      org.apache.spark.sql.types.StructField("precision",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("recall",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("tp",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("support",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("f1",
        org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), schema)
  }

  /** M9: named feature importances of the fitted tree stage
    * (`direction_analysis.ipynb` cells 40-43). */
  def featureImportances(model: PipelineModel,
                         cols: Seq[String] = DefaultFeatures)
      : Seq[(String, Double)] = {
    import org.apache.spark.ml.classification.{GBTClassificationModel,
      RandomForestClassificationModel}
    val imp = model.stages.reverse.collectFirst {
      case m: GBTClassificationModel => m.featureImportances
      case m: RandomForestClassificationModel => m.featureImportances
    }.getOrElse(throw new IllegalArgumentException(
      "pipeline has no tree-ensemble stage with importances"))
    cols.zip(imp.toArray)
  }

  /** M9: accuracy + AUC evaluation report. */
  def evaluate(predictions: DataFrame): (Double, Double) = {
    val withPredCol =
      if (predictions.columns.contains("prediction")) predictions
      else predictions.withColumn("prediction",
        when(col("pred_dir") === -1, 0.0).otherwise(1.0))
    val acc = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .setMetricName("accuracy").evaluate(withPredCol)
    val auc =
      if (predictions.columns.contains("rawPrediction"))
        new BinaryClassificationEvaluator().setLabelCol("label")
          .evaluate(predictions)
      else Double.NaN
    (acc, auc)
  }
}
