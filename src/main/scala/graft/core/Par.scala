package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism for compute-heavy row-local stages.
  *
  * The problem (r20 bench attribution): a single small parquet file scans
  * as ONE split — parquet splits at row-group boundaries, and a <128 MB
  * file written in one commit has one row group, so no
  * maxPartitionBytes/openCostInBytes setting can split it. Every
  * per-row-expensive stage rooted on such a scan (shingling, MinHash
  * signatures, k-means argmin distance folds, PQ encode, the PCA
  * covariance combiner) then runs on ONE core of the 32 the session has:
  * the q_pca covariance pass measured 2.05 s single-threaded at sf0.1
  * where the same arithmetic is ~0.1 s spread across the box.
  *
  * The fix is operator-level and derived from the DATA, not a constant
  * tuned for local mode: fan the frame out to the session's default
  * parallelism ONLY when its scan carries fewer partitions than that. At
  * cluster scale a real input (thousands of files/row groups) always
  * carries at least as many partitions as the session has cores, so
  * [[fanOut]] is a no-op there — it exists purely to stop a small input
  * from serializing a heavy stage onto one core (the guide's idle-
  * capacity rule). The repartition is a hash exchange on the caller's id
  * column: deterministic row->partition placement (safe under task
  * retry), no sort-before-repartition, and every operator that calls
  * this is order-independent by the repo's determinism discipline
  * (decimal sums, row-local argmins), so results are bit-identical
  * either way — specs pin that.
  *
  * `graft.noSmallInputFastPaths=1` disables fan-out (and the other
  * small-input fast paths keyed on this switch): ScaleBench sets it so
  * committed growth laws keep measuring the scale path — the code shape
  * that runs at 100 TB — rather than a kinked curve that switches
  * implementation mid-probe.
  *
  * Only SCAN-ROOTED frames fan (a leaf plus row-local project / filter /
  * generate): anything downstream of an exchange already runs at shuffle
  * parallelism, and probing `df.rdd` on an exchange-bearing plan under
  * AQE would materialize the upstream stages just to read a partition
  * count. The shape check is on the optimized logical plan and costs no
  * job either way.
  */
object Par {

  private[graft] def fastPathsOff: Boolean =
    sys.props.get("graft.noSmallInputFastPaths").contains("1")

  /** Leaf + row-local operators only — the plans whose `.rdd` conversion
    * launches no job and whose partition count is the SCAN's. */
  private def scanRooted(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.optimizedPlan.collect {
      case p: LeafNode => true
      case _: Project | _: Filter | _: Generate | _: SubqueryAlias => true
      case _ => false
    }.forall(identity)
  }

  /** Fan `df` out to the session's default parallelism when it is a
    * scan-rooted frame carrying fewer partitions — a no-op at cluster
    * scale and on already-shuffled frames (see object doc). `keys` is
    * the hash-repartition key (pass the id column). */
  def fanOut(df: DataFrame, keys: Column*): DataFrame = {
    if (fastPathsOff || !scanRooted(df)) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else if (keys.nonEmpty) df.repartition(p, keys: _*)
    else df.repartition(p)
  }
}
