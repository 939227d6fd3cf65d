package graft.operators

import org.apache.spark.sql.DataFrame
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
}
