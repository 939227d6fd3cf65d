package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank by integer power iteration — link-graph
  * importance for dedup-cluster canonicalization, seed-URL scoring, and
  * citation-weighted corpus curation (rank-weighted sampling wants a
  * principled per-document weight, and the link graph supplies one).
  *
  * Rank mass lives on a LONG "pico" grid (1e12 units = total mass 1.0):
  * every per-edge contribution is the integer division `rank div
  * outdeg`, every combine a LONG sum, and the damping step an integer
  * multiply-divide — so each iteration is EXACT, order-independent, and
  * bit-portable to any engine with 64-bit integer arithmetic (the DuckDB
  * oracle replays the same iterations verbatim). Floor division leaks
  * < 1 pico-unit per edge per iteration — bounded and identical
  * everywhere, never a float-summation-order ambiguity.
  *
  * Scale shape per iteration: ONE shuffle of the rank frame onto the
  * edge partitioning (join on src), ONE partial-aggregated shuffle of
  * contributions (groupBy dst — map-side combine absorbs hub in-degree
  * skew), and a 1-row dangling-mass aggregate to the driver. The edge
  * frame (with out-degrees attached) is built once and persisted;
  * lineage is truncated every iteration via localCheckpoint, the same
  * discipline as [[DupClusters.connectedComponents]]. Nothing
  * node-count-sized ever reaches the driver.
  */
object Graph {

  /** 1.0 of rank mass, in integer pico-units. */
  val Pico: Long = 1000000000000L

  /** PageRank over a directed edge list (node ids must be integral;
    * duplicate edges are collapsed — this is the unweighted uniform-split
    * formulation). Dangling-node mass is redistributed uniformly each
    * iteration, per the standard formulation. Returns one row per node:
    * `node`, `rank_pico` (LONG, grid units) and `rank` (double view).
    *
    * rank_{t+1}(v) = (100-d)%·1/N + d%·( Σ_{u→v} rank_t(u) div out(u)
    *                                     + dangling_t div N )
    * with every step in LONG arithmetic, d = `dampingPct`. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 10, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .na.drop().distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val eDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint() // static across iterations: compute + pin once
    val srcSet = eDeg.select("src").distinct().localCheckpoint()
    // (100-d)%·1/N — the teleport share every node gets each iteration
    val base = (Pico - Pico * dampingPct / 100L) / n
    var ranks = nodes.withColumn("r", lit(Pico / n)).localCheckpoint()
    for (_ <- 0 until iterations) {
      val dangling = ranks
        .join(srcSet, ranks("node") === srcSet("src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L))).head().getLong(0)
      val dangShare = dangling / n
      val inSums = eDeg
        .join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("r div outdeg").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__in"))
      ranks = nodes
        .join(inSums, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(
            s"($dampingPct * (coalesce(__in, 0L) + $dangShare)) div 100")
          ).as("r"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("r").as("rank_pico"),
      (col("r").cast("double") / lit(Pico.toDouble)).as("rank"))
  }
}
