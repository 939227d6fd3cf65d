package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the governance report a versioned-dataset
  * pipeline publishes between releases: which documents were added,
  * removed, changed (same id, different content), or carried unchanged.
  * Content identity is md5(text), so "changed" survives re-encodes of
  * identical bytes and a 100 TB diff moves one narrow hash column per
  * side, never text.
  *
  * One full-outer shuffle join on the id; the churn rollup adds one
  * partial-aggregating groupBy. The table-version analog is
  * [[graft.tables.TableOps]] time travel — this is the row-level face.
  */
object CorpusDiff {

  /** Row-level diff: (id, status, old_md5, new_md5) with status in
    * {'added', 'removed', 'changed', 'unchanged'}. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("__id"),
      md5(col(textCol)).as("old_md5"))
    val n = newDf.select(col(idCol).as("__id"),
      md5(col(textCol)).as("new_md5"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") === col("new_md5"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_md5"), col("new_md5"))
  }

  /** Mixture drift between snapshots: each group's share of the old and
    * new corpus, and its contribution to the Jensen-Shannon divergence
    * between the two mixtures — the "did this release quietly change the
    * training mix" check next to [[churn]]'s row-level counts. JS rather
    * than KL: a group that appears or disappears entirely contributes a
    * finite term (0·ln0 = 0 convention) instead of blowing up.
    *
    * Sum `js_contrib` for the divergence (in nats, 0 ≤ JS ≤ ln 2); the
    * per-group rows say WHICH sources moved. Two partial-aggregating
    * groupBys + a full-outer join and share windows over the tiny
    * per-group frame — corpus text is never touched, only counted. */
  def distributionDrift(oldDf: DataFrame, newDf: DataFrame,
                        groupCol: String): DataFrame = {
    val o = oldDf.groupBy(col(groupCol)).agg(count(lit(1)).as("n_old"))
    val n = newDf.groupBy(col(groupCol)).agg(count(lit(1)).as("n_new"))
    // lit(0) partition key: the frame is O(groups) rows no matter the
    // corpus size — the single partition is intended (Packing convention;
    // Catalyst folds the constant key, so the plan shows Exchange
    // SinglePartition over this aggregate — benign)
    val w = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def xlnxm(p: Column, m: Column): Column =
      when(p > 0, p * log(p / m)).otherwise(lit(0.0))
    o.join(n, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("old_share", col("n_old") / sum(col("n_old")).over(w))
      .withColumn("new_share", col("n_new") / sum(col("n_new")).over(w))
      .withColumn("js_contrib", {
        val m = (col("old_share") + col("new_share")) / 2
        (xlnxm(col("old_share"), m) + xlnxm(col("new_share"), m)) / 2
      })
  }

  /** Population stability index contributions — the model-monitoring
    * industry's drift number, next to [[distributionDrift]]'s JS (same
    * shares, different functional): psi_contrib =
    * (new_share' − old_share') · ln(new_share'/old_share') with both
    * shares floored at `eps` so appearing/disappearing groups
    * contribute a large-but-finite term (the standard PSI smoothing
    * convention; JS's 0·ln0 trick does not apply because PSI's weight
    * is the share DIFFERENCE, which is nonzero exactly when one side
    * is empty). Sum `psi_contrib` for the index; the usual triage
    * bands are < 0.1 stable, 0.1–0.25 shifting, > 0.25 action.
    * Every term is ≥ 0 (x·ln of same-sign ratio), so no cancellation
    * hides a moved group. Same shape as [[distributionDrift]]: the
    * frame is O(groups), corpus text only counted. */
  def psiDrift(oldDf: DataFrame, newDf: DataFrame, groupCol: String,
               eps: Double = 1e-6): DataFrame = {
    require(eps > 0 && eps < 1, s"eps must be in (0, 1), got $eps")
    distributionDrift(oldDf, newDf, groupCol)
      .withColumn("psi_contrib", {
        val p = greatest(col("old_share"), lit(eps))
        val q = greatest(col("new_share"), lit(eps))
        (q - p) * log(q / p)
      })
  }

  /** Churn rollup of [[diff]]: counts per (group, status). A doc's
    * group comes from the NEW snapshot when present (a doc can move
    * groups between releases), else from the old — deterministic, never
    * an arbitrary `first`. */
  def churn(oldDf: DataFrame, newDf: DataFrame, idCol: String,
            textCol: String, groupCol: String): DataFrame = {
    val d = diff(oldDf, newDf, idCol, textCol)
    val og = oldDf.select(col(idCol).as("__gid"), col(groupCol).as("__og"))
    val ng = newDf.select(col(idCol).as("__gid"), col(groupCol).as("__ng"))
    val grp = og.join(ng, Seq("__gid"), "full_outer")
      .select(col("__gid"), coalesce(col("__ng"), col("__og"))
        .as(groupCol))
    d.join(grp, d(idCol) === col("__gid"))
      .groupBy(col(groupCol), col("status"))
      .agg(count(lit(1)).as("n"))
  }

  /** Semantic drift between snapshots: per-group embedding centroids
    * for each side, compared by cosine and L2 — the "did this source's
    * CONTENT move, not just its row count" check next to
    * [[distributionDrift]]'s mixture shares. A re-crawl that swaps a
    * source's topic mix shifts its centroid even when volumes hold.
    *
    * Centroids come from [[graft.operators.Embeddings.meanPool]]
    * (per-dim DECIMAL sums — exact, order-independent, engine-portable),
    * so the comparison is bit-stable. Both distances fold dims
    * left-to-right (the q_ann_cosine engine-exact precedent). Shape:
    * two partial-aggregating passes per side (centroid + count; the
    * count pass scans only the group columns) and a groups-sized
    * full-outer join — corpus embeddings are never joined row-to-row.
    * A group absent from one side, or with a zero centroid, yields
    * null distances (cosine convention). */
  def embeddingDrift(oldDf: DataFrame, newDf: DataFrame,
                     groupCols: Seq[String], vecCol: String): DataFrame = {
    require(groupCols.nonEmpty, "embeddingDrift needs group columns")
    def side(df: DataFrame, centroidCol: String, nCol: String) =
      graft.operators.Embeddings.meanPool(df, groupCols, vecCol,
          centroidCol)
        .join(df.groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).as(nCol)), groupCols)
    val l2 = sqrt(aggregate(
      zip_with(col("__co"), col("__cn"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))
    side(oldDf, "__co", "n_old")
      .join(side(newDf, "__cn", "n_new"), groupCols, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        graft.operators.Similarity.cosine(col("__co"), col("__cn"))
          .as("centroid_cos"),
        l2.as("centroid_l2")): _*)
  }
}
