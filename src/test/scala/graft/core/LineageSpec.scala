package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Checkpoint-block hygiene: localCheckpoint pins RDD blocks that
  * Dataset.unpersist does NOT free; Lineage.unpersistCheckpoint must
  * free exactly them, and the iterative operators must leave O(1)
  * frames pinned after a run instead of O(iterations). */
class LineageSpec extends SparkSpec {

  private def pinnedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("unpersistCheckpoint frees a checkpoint leaf; no-op on plans") {
    val before = pinnedIds
    val cp = spark.range(0, 1000).toDF("id").localCheckpoint()
    assert(cp.count() == 1000)
    val pinned = pinnedIds -- before
    assert(pinned.nonEmpty, "localCheckpoint pinned no RDD?")
    // a plain plan (no checkpoint leaf) is a no-op, not an error
    Lineage.unpersistCheckpoint(spark.range(5).toDF("id"))
    // a COMPOSITE plan over the live checkpoint (projection/filter) is
    // also a no-op — it must NOT free the underlying checkpoint blocks
    Lineage.unpersistCheckpoint(cp.select(col("id") * 2 as "x"))
    Lineage.unpersistCheckpoint(
      cp.filter(col("id") < 10).join(spark.range(3).toDF("id"), "id"))
    assert((pinnedIds -- before) == pinned,
      "a composite plan over a checkpoint freed (or pinned) blocks")
    // the checkpoint is still fully readable after those no-ops
    assert(cp.count() == 1000)
    Lineage.unpersistCheckpoint(cp)
    assert((pinnedIds -- before).isEmpty,
      "checkpoint blocks survived unpersistCheckpoint")
  }

  test("pageRank leaves O(1) pinned frames, result still readable") {
    val before = pinnedIds
    val edges = spark.range(0, 400).toDF("i")
      .select((col("i") % 57).as("src"), (col("i") % 31 + 3).as("dst"))
    val pr = graft.operators.Graph.pageRank(edges, "src", "dst",
      iterations = 5)
    // the result must be fully consumable AFTER the superseded rounds
    // were freed (a wrong unpersist target would throw block-not-found)
    assert(pr.count() > 0)
    val leaked = (pinnedIds -- before).size
    // only the FINAL round's checkpoint may remain (plus nothing else:
    // nodes/eDeg/srcSet are freed after the loop)
    assert(leaked <= 1, s"pageRank left $leaked pinned RDDs; " +
      "expected at most the final rank frame")
  }

  test("connectedComponents leaves O(1) pinned frames on a deep chain") {
    val before = pinnedIds
    import spark.implicits._
    val pairs = (0 until 40).map(i => (i.toLong, (i + 1).toLong))
      .toDF("a", "b")
    val cc = graft.operators.DupClusters
      .connectedComponents(pairs, "a", "b")
    assert(cc.select(countDistinct(col("cluster_id"))).head.getLong(0) == 1)
    val leaked = (pinnedIds -- before).size
    assert(leaked <= 1, s"connectedComponents left $leaked pinned RDDs")
  }
}
