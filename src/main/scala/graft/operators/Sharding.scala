package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-shard layout: the final step of a curation
  * run, where the corpus is split into a fixed number of shards that
  * (a) are stable across reruns, retries, and input layout — a
  * re-executed job overwrites each shard with identical content, so a
  * training run can resume against a half-written output — and (b) can
  * be consumed independently by data-parallel trainer ranks.
  *
  * The shard of a row is a pure function of its key (the same portable
  * multiplicative hash as [[Sampling]] — SQL-expressible, so the
  * assignment itself is oracle-checkable), never of partitioning or
  * execution order. `df.repartition(n)` alone gives none of this: its
  * round-robin/hash placement changes under AQE and retries.
  */
object Sharding {

  /** Deterministic shard id in [0, nShards): portable hash of the key.
    * Row-local, zero shuffles. */
  def shardTag(df: DataFrame, keyCol: String, nShards: Int,
               seed: Long = 0L, shardCol: String = "shard"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    Sampling.requireIntegralKey(df, keyCol)
    df.withColumn(shardCol,
      pmod(Sampling.bucketHash(col(keyCol), seed), lit(nShards.toLong)))
  }

  /** Size-balanced deterministic shard id: [[shardTag]] balances COUNTS
    * (hash placement is Poisson in bytes — a heavy-tailed corpus leaves
    * some trainer ranks with straggler shards), this balances the size
    * column too. Construction: order the corpus by (size-magnitude
    * bucket DESC, hash, id) — big documents first, hash-shuffled within
    * a magnitude — and deal rows round-robin: shard = rank mod nShards.
    * Every shard receives every nShards-th row of a magnitude-stratified
    * stream, so per-shard size totals concentrate tightly (stratified
    * allocation) while staying a pure function of (key, size, corpus) —
    * rerun/retry/layout-stable like everything else here.
    *
    * The magnitude bucket is the DIGIT COUNT of the integral size —
    * engine-exact (no cross-engine log2 rounding risk), and coarse on
    * purpose: within a bucket sizes differ by <10x and the hash order
    * interleaves them.
    *
    * The global rank uses [[Packing]]'s two-level scan (range-shard on
    * (bucket, hash slice), per-slice row_number, slice counts -> offsets
    * broadcast back), so there is NO global window: the only full-data
    * shuffle is the per-slice window; the offsets frame is
    * O(10 x nRangeShards) rows regardless of corpus size. */
  def balancedShardTag(df: DataFrame, keyCol: String, sizeCol: String,
                       nShards: Int, seed: Long = 0L,
                       nRangeShards: Int = 256,
                       shardCol: String = "shard"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(nRangeShards > 0 && Sampling.HashRange % nRangeShards == 0,
      s"nRangeShards ($nRangeShards) must divide ${Sampling.HashRange}")
    Sampling.requireIntegralKey(df, keyCol)
    Sampling.requireIntegralKey(df, sizeCol)
    val width = Sampling.HashRange / nRangeShards
    val keyed = df
      .withColumn("__bucket", length(col(sizeCol).cast("string")))
      .withColumn("__h", Sampling.bucketHash(col(keyCol), seed))
      .withColumn("__slice", expr(s"__h div $width"))
    val inSlice = Window.partitionBy(col("__bucket"), col("__slice"))
      .orderBy(col("__h"), col(keyCol))
    val within = keyed.withColumn("__rk",
      row_number().over(inSlice).cast("long") - 1L)
    // offsets over the tiny (bucket x slice) frame; the single partition
    // is intended and O(10 x slices). The lit(0) key is constant-folded
    // away by Catalyst, so the physical plan shows Exchange
    // SinglePartition — fine on a post-aggregate frame (Packing convention)
    val sliceOrder = Window.partitionBy(lit(0))
      .orderBy(col("__bucket").desc, col("__slice").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("__bucket"), col("__slice"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(sliceOrder), lit(0L)))
      .select(col("__bucket"), col("__slice"), col("__offset"))
    within.join(broadcast(offsets), Seq("__bucket", "__slice"))
      .withColumn(shardCol,
        pmod(col("__offset") + col("__rk"), lit(nShards.toLong)))
      .drop("__bucket", "__h", "__slice", "__rk", "__offset")
  }

  /** Write one directory per shard (`shard=K/` partitions), rows sorted
    * within each shard by `orderCols` then the key — a fully
    * deterministic byte layout, so two runs of the same corpus produce
    * file-identical shards. One shuffle (the repartition by shard);
    * sorting is per-partition, never global. */
  def writeShards(df: DataFrame, path: String, keyCol: String,
                  nShards: Int, orderCols: Seq[String] = Nil,
                  seed: Long = 0L): Unit = {
    val tagged = shardTag(df, keyCol, nShards, seed)
    tagged.repartition(nShards, col("shard"))
      .sortWithinPartitions(
        (col("shard") +: orderCols.map(col)) :+ col(keyCol): _*)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }
}
