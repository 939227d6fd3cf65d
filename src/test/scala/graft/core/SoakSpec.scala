package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Session-lifetime soak: the r15 checkpoint-hygiene bug (localCheckpoint
  * blocks pinned O(iterations) per run, freed by neither
  * Dataset.unpersist nor clearCache) only surfaced as a 1.3-2x slowdown
  * in a LONG multi-query session at 64x data — far outside unit-test
  * reach. This spec catches the defect class at test time,
  * deterministically, by counting BLOCK-MANAGER RDD blocks instead of
  * timing. Two measurement traps pinned here, both learned the hard way:
  * `sc.getPersistentRDDs` is weak-valued (a leaked RDD's entry vanishes
  * on driver GC while its blocks stay resident — the map reads clean
  * during an active leak), so the metric must be
  * `BlockManagerMaster.getMatchingBlockIds(_.isRDD)`; and the shared
  * test session runs with `spark.cleaner.referenceTracking=false`
  * (SparkSpec) so ContextCleaner can't free leaked blocks on GC luck —
  * with the Lineage.unpersistCheckpoint calls no-op'd, this spec
  * measures ~10 leaked blocks per pageRank run and fails; with them in
  * place, at most one final frame per invocation remains. */
class SoakSpec extends SparkSpec {

  private def rddBlocks: Int =
    org.apache.spark.SparkEnv.get.blockManager.master
      .getMatchingBlockIds(_.isRDD, askStorageEndpoints = true).size

  test("repeated iterative-operator runs keep block storage O(1) per run; " +
    "a harness-style drop returns it to baseline") {
    val edges = spark.range(0, 600).toDF("i")
      .select((col("i") % 83).as("src"), (col("i") % 47 + 5).as("dst"))
    val pairs = spark.range(0, 60).toDF("i")
      .select(col("i").as("a"), (col("i") + 1).as("b"))
    val before = rddBlocks
    val runs = 4
    // hold the results strongly until after the harness drop below:
    // sc.getPersistentRDDs is weak-valued, so a GC'd final frame would
    // slip past the drop (in production JVMs ContextCleaner mops those
    // up; this session runs with it off — see the scaladoc)
    val results = (1 to runs).flatMap { _ =>
      val a = graft.operators.Graph.pageRank(edges, "src", "dst",
        iterations = 6)
      assert(a.count() > 0)
      val b = graft.operators.DupClusters.connectedComponents(
        pairs, "a", "b")
      assert(b.count() > 0)
      val c = graft.operators.Graph.kCore(edges, "src", "dst", k = 2)
      assert(c.count() >= 0)
      val d = graft.operators.Graph.kHopNeighborhood(edges, "src", "dst",
        maxHops = 3)
      assert(d.count() > 0)
      Seq(a, b, c, d)
    }
    val grown = rddBlocks - before
    // 4 operators x 4 runs, each entitled to ONE caller-owned final
    // frame (a handful of partition blocks). The reverted hygiene path
    // leaks ~10 blocks per pageRank run ALONE (nodes/eDeg/srcSet + one
    // frame per iteration), blowing far past this bound.
    val budget = 4 * runs * 4
    assert(grown <= budget,
      s"iterative operators grew RDD block storage by $grown blocks " +
        s"over ${4 * runs} invocations (budget $budget) — checkpoint " +
        "hygiene regressed (Lineage.unpersistCheckpoint not freeing " +
        "superseded rounds?)")
    // the Bench/ScaleBench between-query discipline must fully reclaim
    // (drop via the weak map while entries are still live, then verify
    // at the block level)
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    assert(rddBlocks <= before,
      s"harness drop left ${rddBlocks - before} extra RDD blocks")
    assert(results.nonEmpty) // keep the strong references reachable here
    // and the session is still fully usable afterwards
    assert(graft.operators.Graph.pageRank(edges, "src", "dst",
      iterations = 2).count() > 0)
  }
}
