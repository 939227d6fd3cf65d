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

  test("shardTag fails fast on non-integral keys") {
    val d = df("k STRING, v INT", Row("a", 1))
    val e = intercept[IllegalArgumentException] {
      Sharding.shardTag(d, "k", 4)
    }
    assert(e.getMessage.contains("integral"))
  }
}
