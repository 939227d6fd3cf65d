package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Prep

/** Purged k-fold time-series cross-validation with embargo (López de
  * Prado 2018, "Advances in Financial Machine Learning" ch. 7) — the
  * leakage-safe CV split for samples whose labels are computed over a
  * FORWARD time window. A plain random or hash split (M4,
  * `Sampling.hashSplitTag`) leaks when labels overlap in time: a train
  * sample whose label window [t, t+H] straddles the test block has
  * already "seen" test-period outcomes. The reference's ML pipeline
  * labels mid-price direction over a forward horizon
  * (`prediction_ML_pipeline.py:142-171`) and time-splits train/test
  * (`:183-204`); this operator is the k-fold generalization of that
  * split with the purge/embargo discipline the finance-ML literature
  * demands.
  *
  * Fold assignment is by GLOBAL TIME ORDINAL (equal-count contiguous
  * time blocks): pos = the [[Prep.timeOrderSeq]] rank under
  * (tsCol, tieCol) — the O1 two-level scan, no corpus-wide window —
  * and fold = (pos * k) div n. For each test fold with time extent
  * [lo, hi], every row gets a role:
  *
  *  - `test`    — the fold's own rows;
  *  - `purged`  — label window [ts, ts+H] overlaps the test fold's
  *                LABEL extent [lo, hi + H] (test labels reach to
  *                hi + H): ts <= hi + H AND ts + H >= lo;
  *  - `embargo` — inside the post-test embargo strip
  *                (hi + H, hi + H + E]: serial correlation right after
  *                the test block leaks even without literal overlap;
  *  - `train`   — everything else.
  *
  * All comparisons are exact LONG-ns arithmetic — engine-portable with
  * no float rounding to diverge on. NULL-ts rows rank first (the
  * timeOrderSeq contract) and can never be purged/embargoed (no time
  * to overlap with) — they are test in their own fold, train
  * elsewhere. Role rows are emitted per NON-EMPTY fold: in the
  * degenerate n < k case the high folds receive no rows, so no test
  * view exists for them (PurgedSplitPropertySpec pins this against a
  * brute-force reference).
  *
  * Scale: one two-level ordinal scan, one k-row fold-extent aggregate
  * broadcast back, and a row-local role CASE per fold. The k× output
  * is inherent to materializing every fold's view at once; a driver
  * training fold i filters `fold === i`, which Catalyst pushes into
  * the broadcast side so each pass stays one corpus scan.
  */
object PurgedSplit {

  /** (fold, <idCol>, role) for every (row, test-fold) pair.
    *
    * @param tsCol          LONG epoch-ns event time
    * @param tieCol         total-order tie-break within equal ts
    * @param k              number of folds (>= 2)
    * @param labelHorizonNs forward label window H in ns (>= 0)
    * @param embargoNs      embargo strip E after hi + H in ns (>= 0)
    */
  def purgedKFold(df: DataFrame, tsCol: String, tieCol: String, k: Int,
                  labelHorizonNs: Long, embargoNs: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(labelHorizonNs >= 0,
      s"labelHorizonNs must be >= 0, got $labelHorizonNs")
    require(embargoNs >= 0, s"embargoNs must be >= 0, got $embargoNs")
    val pos = Prep.timeOrderSeq(
      df.select(col(tsCol), col(tieCol)), tsCol, tieCol, posCol = "__pos")
    // n from a 1-row broadcast stat frame, not a driver action — the
    // fold bound stays inside the one declarative plan
    val n = pos.agg((max(col("__pos")) + 1L).as("__n"))
    val folded = pos.crossJoin(broadcast(n))
      .withColumn("fold", expr(s"__pos * $k div __n"))
      .select(col(tsCol), col(tieCol), col("fold"))
    val edges = folded.groupBy(col("fold").as("__test_fold"))
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
    val h = lit(labelHorizonNs)
    val ts = col(tsCol)
    folded.crossJoin(broadcast(edges))
      .select(
        col("__test_fold").as("fold"),
        col(tieCol),
        when(col("fold") === col("__test_fold"), "test")
          .when(ts <= col("__hi") + h && ts + h >= col("__lo"), "purged")
          .when(ts > col("__hi") + h &&
            ts <= col("__hi") + h + lit(embargoNs), "embargo")
          .otherwise("train").as("role"))
  }

  /** One fold's training view: the rows whose role is `train` for
    * `testFold` — what a per-fold model fit actually consumes. Joins
    * the role surface back to the full row (so callers keep their
    * feature columns) and filters; one corpus scan per fold. */
  def trainingSet(df: DataFrame, tsCol: String, tieCol: String, k: Int,
                  labelHorizonNs: Long, embargoNs: Long,
                  testFold: Int): DataFrame = {
    require(testFold >= 0 && testFold < k,
      s"testFold must be in [0, $k), got $testFold")
    val roles = purgedKFold(df, tsCol, tieCol, k, labelHorizonNs, embargoNs)
      .filter(col("fold") === testFold && col("role") === "train")
      .select(col(tieCol))
    df.join(roles, Seq(tieCol), "left_semi")
  }
}
