package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ClusteringSpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Double])*) =
    df("id BIGINT, vec ARRAY<DOUBLE>", rows.map(r => Row(r._1, r._2)): _*)

  // three well-separated 2-d blobs; ids interleaved across blobs so the
  // init (3 smallest ids) starts one centroid in each blob
  private def blobs: Seq[(Long, Seq[Double])] = {
    val centers = Seq(Seq(0.0, 0.0), Seq(10.0, 10.0), Seq(-10.0, 10.0))
    (0L until 30L).map { i =>
      val c = centers((i % 3).toInt)
      val jitter = Seq(0.01 * (i % 7), 0.01 * (i % 5))
      i -> Seq(c(0) + jitter(0), c(1) + jitter(1))
    }
  }

  test("kmeans separates well-separated blobs (one cluster per blob)") {
    val got = Clustering.kmeans(vecs(blobs: _*), "id", "vec",
        k = 3, maxIter = 3)
      .select("id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // all members of a blob agree, and the three blobs get 3 distinct ids
    val byBlob = blobs.map(_._1).groupBy(_ % 3)
      .map { case (b, ids) => b -> ids.map(got).toSet }
    assert(byBlob.values.forall(_.size == 1), s"split blob: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 3)
  }

  test("kmeans is layout-stable: repartitioned input, identical assignment") {
    val d = vecs(blobs: _*)
    def run(frame: org.apache.spark.sql.DataFrame) =
      Clustering.kmeans(frame, "id", "vec", k = 3, maxIter = 2)
        .select("id", "cluster").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(run(d) == run(d.repartition(7)))
  }

  test("an emptied cluster keeps its previous centroid (no crash, k ids)") {
    // ids 0 and 1 share a vector: init puts two centroids on the same
    // point, every tie goes to cluster 0, cluster 1 empties immediately
    val d = vecs(0L -> Seq(0.0, 0.0), 1L -> Seq(0.0, 0.0),
      2L -> Seq(0.1, 0.0), 3L -> Seq(9.0, 9.0), 4L -> Seq(9.1, 9.0))
    val got = Clustering.kmeans(d, "id", "vec", k = 3, maxIter = 3)
      .select("id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.values.forall(c => c >= 0 && c < 3))
    assert(got(0L) == got(1L)) // identical vectors always co-assign
    assert(got(3L) == got(4L) && got(3L) != got(0L))
  }

  test("kmeans with maxIter=0 assigns against the init vectors") {
    val d = vecs(0L -> Seq(0.0), 1L -> Seq(10.0), 2L -> Seq(0.4),
      3L -> Seq(9.5))
    val got = Clustering.kmeans(d, "id", "vec", k = 2, maxIter = 0)
      .select("id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 1))
  }

  test("semDupPairs == brute-force cosine pairs restricted to co-clustered") {
    // near-duplicate pairs planted inside blobs: 100~101, 102~103
    val base = blobs
    // planted pairs are exact scalar multiples (cosine = 1)
    val extra = Seq(
      100L -> Seq(0.001, 0.002), 101L -> Seq(0.002, 0.004),
      102L -> Seq(10.0, 10.001), 103L -> Seq(20.0, 20.002))
    val d = vecs(base ++ extra: _*)
    val assigned = Clustering.kmeans(d, "id", "vec", k = 3, maxIter = 2)
      .select("id", "vec", "cluster").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getInt(2)))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na > 0 && nb > 0) dot / (na * nb) else 0.0
    }
    val expect = (for {
      (ia, va, ca) <- assigned; (ib, vb, cb) <- assigned
      if ia < ib && ca == cb &&
        math.floor(cos(va, vb) * 1e6 + 0.5) >= math.floor(0.9999 * 1e6 + 0.5)
    } yield (ia, ib)).toSet
    val got = Clustering.semDupPairs(d, "id", "vec", k = 3, maxIter = 2,
        minCosine = 0.9999)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    assert(got.contains((100L, 101L)) && got.contains((102L, 103L)))
  }

  test("semDedup keeps one representative per semantic-dup component") {
    val d = vecs(
      0L -> Seq(1.0, 0.0), 1L -> Seq(1.0, 0.0001), 2L -> Seq(1.0001, 0.0),
      10L -> Seq(-1.0, 5.0), // far singleton
      20L -> Seq(0.0, -7.0)) // far singleton
    val kept = Clustering.semDedup(d, "id", "vec", k = 3, maxIter = 2,
        minCosine = 0.9999)
      .collect().map(_.getLong(0)).sorted
    // {0,1,2} collapse to 0; singletons survive
    assert(kept.sameElements(Array(0L, 10L, 20L)))
  }

  test("sharded face with ONE shard is bit-identical to flat semDupPairs") {
    val d = vecs(blobs: _*)
    val flat = Clustering.semDupPairs(d, "id", "vec", k = 3, maxIter = 2,
        minCosine = 0.5)
      .select(col("id_a"), col("id_b"), col("cluster"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    // n = 30 <= shardSizeTarget => bits = 0, one shard, no sub-split:
    // the composition must reduce EXACTLY to flat (same init, same
    // micro argmin grid, same DECIMAL means, same emptied-cell rule) —
    // including bit-equal cosines
    val sharded = Clustering.semDupPairsSharded(d, "id", "vec",
        shardSizeTarget = 1000, cellsPerShard = 3, maxIter = 2,
        minCosine = 0.5)
      .select(col("id_a"), col("id_b"), col("cell"), col("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    assert(sharded == flat,
      s"only-flat=${(flat -- sharded).take(5)} " +
        s"only-sharded=${(sharded -- flat).take(5)}")
  }

  test("sharded semDedup: exact duplicates always co-shard (identical " +
    "signature) and collapse; multi-shard run stays correct") {
    // 600 vectors -> multiple shards at target 64; planted exact-dup
    // pairs (i, i+1000) with IDENTICAL vectors — same SRP signature by
    // construction, so blocking can never separate them
    val rows = (0L until 300L).map { i =>
      val v = Seq(math.sin(i * 0.37) * 3, math.cos(i * 0.53) * 3,
        math.sin(i * 0.11 + 1) * 2, math.cos(i * 0.29 + 2) * 2)
      i -> v
    }
    val planted = rows.map { case (i, v) => (i + 1000L) -> v }
    val d = vecs((rows ++ planted): _*)
    val kept = Clustering.semDedupSharded(d, "id", "vec",
        shardSizeTarget = 64, cellsPerShard = 4, maxIter = 2,
        minCosine = 0.999999)
      .collect().map(_.getLong(0)).toSet
    // every planted twin collapses onto its original (smaller id wins)
    assert((0L until 300L).forall(i => kept(i) && !kept(i + 1000L)),
      s"missed twins: ${(0L until 300L).filterNot(i => !kept(i + 1000L)).take(5)}")
  }

  test("sharded face sub-splits a pathologically skewed shard") {
    // all vectors in the same orthant => ONE sign bucket regardless of
    // bits; with n >> 4x target the splitter must engage (no blow-up,
    // correct dedup within sub-shards not asserted — only the bound)
    val rows = (0L until 200L).map(i =>
      i -> Seq(1.0 + 0.001 * i, 2.0 + 0.002 * (i % 7), 0.5, 1.5))
    val d = vecs(rows: _*)
    val pairs = Clustering.semDupPairsSharded(d, "id", "vec",
        shardSizeTarget = 10, cellsPerShard = 2, maxIter = 1,
        minCosine = 0.0)
    val maxShard = pairs.groupBy(col("shard"))
      .agg(countDistinct(col("id_a")).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    // 200 ids in one sign bucket, target 10 => splits = ceil(200/20)=10
    // sub-shards of ~20 each; without the splitter this reads ~199
    assert(maxShard < 80, s"skewed shard not sub-split: $maxShard")
  }
}
