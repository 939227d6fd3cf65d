package graft.core

import org.apache.spark.sql.DataFrame

/** Checkpoint-block hygiene for iterative operators.
  *
  * `Dataset.localCheckpoint` pins its materialized rows as RDD storage
  * blocks, and `Dataset.unpersist` does NOT free them (it only touches
  * the SQL cache) — the blocks live until the DRIVER garbage-collects
  * the internal RDD reference and ContextCleaner gets around to them.
  * An iterative operator that checkpoints every round therefore pins
  * O(rounds) full frames for an unbounded time; on a large driver heap
  * GC may simply never run. Measured (round 15, x64 tables): a long
  * multi-query session accumulated enough dead checkpoint blocks that
  * late heavy queries ran 1.3-2x slower than the same queries in a
  * fresh JVM.
  *
  * The iterative operators (PageRank family, k-core, k-hop BFS,
  * connected components) call [[unpersistCheckpoint]] on each
  * superseded round frame the moment its successor is MATERIALIZED
  * (all checkpoints here are eager), bounding in-flight checkpoint
  * storage to O(1) frames per running operator regardless of iteration
  * count. The FINAL round's frame is never freed here — the caller's
  * result is a projection over it.
  */
object Lineage {

  /** Free the storage blocks behind a frame RETURNED BY
    * `localCheckpoint` — i.e. whose analyzed plan ROOT is the
    * LogicalRDD leaf holding the pinned RDD. The frame must never be
    * read again — checkpoint blocks are NOT recomputable, lineage is
    * truncated by design. No-op on anything else, including COMPOSITE
    * plans that merely CONTAIN a checkpoint leaf (a join or projection
    * over a still-live checkpoint must not free that checkpoint's
    * blocks out from under it), so callers can pass a handle
    * unconditionally. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
