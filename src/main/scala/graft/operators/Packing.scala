package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-then-chunk sequence packing for pretraining pipelines: order the
  * corpus deterministically, imagine the token streams concatenated, and
  * cut the stream at every `budget` tokens — each document lands in
  * chunk `floor(exclusive_prefix_tokens / budget)` at offset
  * `prefix mod budget`. This is the standard "concatenate and chunk"
  * packing (documents may straddle a cut; the trainer splits them), and
  * unlike greedy bin-packing it is embarrassingly parallel once the
  * prefix sums exist.
  *
  * The global exclusive prefix sum is the scale problem: a single
  * `Window.orderBy` with no partition key funnels 100 TB through one task.
  * [[concatChunks]] instead runs the classic two-level distributed scan:
  *   1. shard by a RANGE of the deterministic order key (shard = h div w,
  *      monotone in h, so shard order == global order),
  *   2. within-shard exclusive running sum (parallel window per shard),
  *   3. per-shard totals -> exclusive running offsets (a `nShards`-row
  *      frame, window over the tiny side only),
  *   4. broadcast the offsets back: prefix = shard_offset + within_shard.
  * Equal to the single global window by construction, with the only
  * full-data shuffle being the per-shard window.
  */
object Packing {

  /** Assign every row a pack chunk id and intra-chunk offset.
    *
    * @param tokenCol  per-row token (or any cost) count, non-negative
    * @param budget    tokens per chunk
    * @param nShards   prefix-sum fan-out; must divide [[Sampling.HashRange]]
    * @param groupCols optional scope columns (language, source, ...):
    *                  chunks never span groups and `chunk_id` restarts at
    *                  0 per group — the "don't mix languages in a context
    *                  window" pretrain constraint. The prefix sum runs
    *                  per (group, shard); shard offsets stay a tiny
    *                  broadcast (groups x nShards rows).
    * @param carryCols payload columns (text, quality, ...) passed through
    *                  unchanged. They ride the per-shard window shuffle —
    *                  the one full-data exchange this operator already
    *                  pays — which at corpus scale beats re-joining the
    *                  payload afterwards (a second shuffle plus a second
    *                  execution of whatever produced `df`).
    */
  def concatChunks(df: DataFrame, idCol: String, tokenCol: String,
                   budget: Long, seed: Long = 0L,
                   nShards: Int = 256,
                   groupCols: Seq[String] = Nil,
                   carryCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nShards > 0 && Sampling.HashRange % nShards == 0,
      s"nShards ($nShards) must divide ${Sampling.HashRange}")
    Sampling.requireIntegralKey(df, idCol) // a string id would hash to
    // null __shard and the offsets join would silently drop every row
    val width = Sampling.HashRange / nShards
    val gCols = groupCols.map(col)
    val cCols = carryCols.map(col)
    val keyed = df.select((col(idCol) +: col(tokenCol) +: (gCols ++ cCols)) :+
        Sampling.bucketHash(col(idCol), seed).as("__h"): _*)
      .withColumn("__shard", expr(s"__h div $width"))
    val inShard = Window.partitionBy(gCols :+ col("__shard"): _*)
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = keyed.withColumn("__within",
      coalesce(sum(col(tokenCol)).over(inShard), lit(0L)))
    // lit(0) partition key: the offsets frame is O(groups x nShards) rows
    // no matter the corpus size, so a single partition is intended here.
    // Note Catalyst constant-folds the foldable key out of the window spec,
    // so the physical plan still shows Exchange SinglePartition (and logs
    // the "No Partition Defined" warning) — both are benign on this
    // post-aggregate frame; PlanQualitySpec pins that the only single-
    // partition exchange feeds an aggregate, never the corpus scan
    val shardOrder = (if (groupCols.isEmpty) Window.partitionBy(lit(0))
                      else Window.partitionBy(gCols: _*))
      .orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(gCols :+ col("__shard"): _*)
      .agg(sum(col(tokenCol)).as("__total"))
      .withColumn("__offset",
        coalesce(sum(col("__total")).over(shardOrder), lit(0L)))
      .select(gCols :+ col("__shard") :+ col("__offset"): _*)
    within.join(broadcast(offsets), groupCols :+ "__shard")
      .withColumn("__prefix", col("__offset") + col("__within"))
      .select((gCols :+ col(idCol) :+ col(tokenCol)) ++ cCols :+
        expr(s"__prefix div $budget").as("chunk_id") :+
        pmod(col("__prefix"), lit(budget)).as("chunk_offset"): _*)
  }

  /** Per-chunk packing report: document count, token total, and the spill
    * past the budget boundary (the tokens the trainer splits off into the
    * next chunk; always < the last document's length). Pass the same
    * `groupCols` given to [[concatChunks]] — chunk ids restart per group,
    * so the report keys on (group, chunk). */
  def chunkStats(packed: DataFrame, tokenCol: String, budget: Long,
                 groupCols: Seq[String] = Nil): DataFrame =
    packed.groupBy(groupCols.map(col) :+ col("chunk_id"): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("tokens"),
        greatest(lit(0L),
          max(col("chunk_offset") + col(tokenCol)) - lit(budget))
          .as("spill"))
}
