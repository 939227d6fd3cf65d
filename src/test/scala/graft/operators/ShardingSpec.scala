package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ShardingSpec extends SparkSpec {

  private def docs(n: Int) =
    df("doc_id BIGINT, text STRING",
      (1 to n).map(i => Row(i.toLong, s"doc number $i")): _*)

  test("shardTag: stable across layouts, in range, balanced on 10k keys") {
    val d = docs(10000)
    def tags(x: org.apache.spark.sql.DataFrame) =
      Sharding.shardTag(x, "doc_id", 16).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val a = tags(d)
    val b = tags(d.repartition(13))
    assert(a == b, "shard assignment drifted under repartitioning")
    assert(a.values.forall(s => s >= 0 && s < 16))
    val counts = a.values.groupBy(identity).view.mapValues(_.size)
    assert(counts.size == 16)
    assert(counts.values.max < counts.values.min * 2,
      s"shards unbalanced: ${counts.toMap}")
  }

  test("writeShards: round-trips the corpus, shard dirs on disk, " +
    "rerun produces identical shard contents") {
    val d = docs(500)
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Sharding.writeShards(d, s"$dir/out", "doc_id", 8)
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 500L)
    assert(back.select("shard").distinct().count() == 8L)
    // same rows, nothing lost or duplicated
    val ids = back.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (1L to 500L))
    // determinism: per-shard id sets identical on a rerun from a
    // different input layout
    // partition dirs read back as INT — cast for a stable comparison
    def byShard(p: String) = spark.read.parquet(p)
      .select(col("shard").cast("long"), col("doc_id")).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    val first = byShard(s"$dir/out")
    Sharding.writeShards(d.repartition(11), s"$dir/out2", "doc_id", 8)
    assert(byShard(s"$dir/out2") == first)
  }

  // heavy-tailed sizes: 2% of docs are 100x the median — the layout that
  // makes hash sharding's per-shard byte totals straggle
  private def heavyTailed = df("doc_id BIGINT, sz BIGINT",
    (1 to 2000).map { i =>
      val size = if (i % 50 == 0) 50000L else 400L + (i % 200)
      Row(i.toLong, size)
    }: _*)

  test("balancedShardTag == one global ROW_NUMBER over (bucket DESC, h, " +
    "id) mod n — the two-level scan is the global rank") {
    import org.apache.spark.sql.expressions.Window
    val d = heavyTailed
    val got = Sharding.balancedShardTag(d, "doc_id", "sz", nShards = 8,
        seed = 5L, nRangeShards = 16)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy(lit(0)).orderBy(
      length(col("sz").cast("string")).desc,
      Sampling.bucketHash(col("doc_id"), 5L), col("doc_id"))
    val ref = d.withColumn("shard",
        pmod(row_number().over(w).cast("long") - 1L, lit(8L)))
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("balancedShardTag: per-shard byte totals concentrate where hash " +
    "sharding straggles; layout-stable") {
    val d = heavyTailed
    def spread(tagged: org.apache.spark.sql.DataFrame): Double = {
      val totals = tagged.groupBy("shard").agg(sum("sz").as("b"))
        .collect().map(_.getLong(1))
      (totals.max - totals.min).toDouble / (totals.sum / totals.length)
    }
    val balanced = spread(
      Sharding.balancedShardTag(d, "doc_id", "sz", 8, seed = 5L))
    val hashed = spread(Sharding.shardTag(d, "doc_id", 8, seed = 5L))
    // the dealt shards are near-uniform; hash placement is Poisson in
    // the 100x tail (one extra big doc swings a shard by ~25%)
    assert(balanced < 0.05, f"balanced spread $balanced%.3f")
    assert(balanced < hashed / 2,
      f"expected clear improvement: balanced=$balanced%.3f hashed=$hashed%.3f")
    // layout stability
    val a = Sharding.balancedShardTag(d, "doc_id", "sz", 8, seed = 5L)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sharding.balancedShardTag(d.repartition(13), "doc_id", "sz",
        8, seed = 5L)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("shardTag fails fast on non-integral keys") {
    val d = df("k STRING, v INT", Row("a", 1))
    val e = intercept[IllegalArgumentException] {
      Sharding.shardTag(d, "k", 4)
    }
    assert(e.getMessage.contains("integral"))
  }
}
