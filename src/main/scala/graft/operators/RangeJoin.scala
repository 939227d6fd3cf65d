package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: points matched to the intervals that contain
  * them, `p >= start && p <= end`, co-keyed on `byKeys`. The reference
  * never needs one (its panels are regular bins — TimeBins territory),
  * but irregular-interval containment is a first-class analytics join
  * Spark lacks natively: the naive plan for a non-equi predicate is a
  * broadcast-nested-loop or cartesian product, O(|P|·|I|) per key.
  *
  * Scale design — cell-bucketed decomposition (the standard interval-
  * join recipe; Flink's interval join and Databricks' range-join
  * binning use the same idea): pick a cell width, explode each interval
  * to the cells it covers (`len/cell + 1` replicas), bucket each point
  * into its single cell, equi-join on `(byKeys, cell)`, then apply the
  * exact containment predicate. Because a point lives in exactly ONE
  * cell, every (point, interval) pair meets in exactly one join row —
  * no post-join dedup. Cost: one shuffle of points (never replicated)
  * plus `sum(len)/cell` interval replicas; choose `cell` near the
  * median interval length to bound the replication factor. Skewed keys
  * fall out of the picture entirely — the join key is `(key, cell)`,
  * so a hot key's long time range spreads over its cells.
  *
  * All cell arithmetic is integer (`div`), exact for int64 epoch-nanos
  * — double division would lose precision above 2^53.
  */
object RangeJoin {

  /** Inner-join `points` to the containing intervals. Interval bounds
    * are inclusive on both ends (session bounds are event times).
    * Callers keep column names disjoint apart from `byKeys`. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      byKeys: Seq[String], ptCol: String,
                      startCol: String, endCol: String,
                      cellNs: Long): DataFrame = {
    require(cellNs > 0, s"cellNs must be positive, got $cellNs")
    val iv = intervals.withColumn("__cell",
      explode(sequence(expr(s"$startCol div ${cellNs}L"),
        expr(s"$endCol div ${cellNs}L"))))
    val pt = points.withColumn("__cell", expr(s"$ptCol div ${cellNs}L"))
    pt.join(iv, byKeys :+ "__cell")
      .where(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__cell")
  }
}
