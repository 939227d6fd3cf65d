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
}
