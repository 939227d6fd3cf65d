package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an embedding column, and the
  * SemDeDup composition built on it (Abbas et al. 2023, "SemDeDup: Data-
  * efficient learning at web-scale through semantic deduplication":
  * cluster first, then look for semantic duplicates ONLY within a
  * cluster — the step that makes embedding-level dedup feasible when
  * all-pairs cosine is off the table).
  *
  * Engine-portable determinism, same discipline as the rest of the repo:
  *   - init = the vectors of the k smallest ids (no random restarts);
  *   - assignment = argmin of the MICRO-ROUNDED squared L2 distance,
  *     ties to the smaller cluster index — float summation-order noise
  *     (~1e-13 relative) cannot flip an argmin decided on 1e-6 grid;
  *   - centroid update = per-dimension DECIMAL(18,9)-summed means
  *     ([[Embeddings.meanPoolLong]]'s formula), exact and layout-stable;
  *   - an emptied cluster keeps its previous centroid.
  * Same corpus + k + iterations = bit-identical assignment on any
  * partitioning, any rerun, any engine (the DuckDB oracle unrolls the
  * same iterations in SQL).
  *
  * Scale shape: each iteration is ONE distributed pass — assignment is a
  * row-local argmin against k broadcast centroid literals, the update a
  * partial-aggregating groupBy over (cluster, dim) collecting k*dims
  * doubles to the driver. Lineage does NOT stack across iterations
  * (iteration i depends only on the input and the collected centroids),
  * so maxIter=10 is 10 scans, not a 10-deep replay. */
object Clustering {

  private[operators] def microL(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)).cast("long")

  /** Squared L2 distance to a centroid literal, folded left-to-right
    * over dims (deterministic order). */
  private[operators] def sqDist(vec: Column, centroid: Array[Double]): Column =
    aggregate(zip_with(vec, typedlit(centroid.toSeq),
      (x, c) => (x - c) * (x - c)), lit(0.0), (acc, v) => acc + v)

  /** Row-local argmin assignment: array_min over (dist_micro, index)
    * structs — lexicographic struct order gives the tie-to-smaller-index
    * rule for free. */
  private[operators] def assign(vec: Column, centroids: Array[Array[Double]]): Column =
    array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(microL(sqDist(vec, c)).as("d"), lit(i).as("c"))
    }: _*)).getField("c")

  /** The trained centroids alone (k x dims doubles on the driver) — for
    * callers that need the model rather than the assignment, e.g. as the
    * coarse quantizer of [[Similarity.ivfTopK]]. */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
                      maxIter: Int): Array[Array[Double]] = {
    require(k > 0, s"k must be positive, got $k")
    require(maxIter >= 0, s"maxIter must be non-negative, got $maxIter")
    val vec = transform(col(vecCol), _.cast("double"))
    var centroids: Array[Array[Double]] = df
      .select(col(idCol), vec.as("__km_v"))
      .orderBy(col(idCol)).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(centroids.length == k,
      s"k=$k but the input has only ${centroids.length} rows")

    for (_ <- 1 to maxIter) {
      val assigned = df.select(vec.as("__km_v"),
        assign(vec, centroids).as("__km_c"))
      val means = Embeddings.meanPoolLong(assigned, Seq("__km_c"), "__km_v")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1)
        .map { case (c, dims) =>
          c -> dims.sortBy(_._2).map(_._3)
        }
      // an emptied cluster keeps its previous centroid
      centroids = centroids.zipWithIndex.map { case (prev, i) =>
        means.getOrElse(i, prev)
      }
    }
    centroids
  }

  /** Lloyd's k-means: returns the input plus an integer `clusterCol` in
    * [0, k). `maxIter` full update iterations run before the final
    * assignment. */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
             maxIter: Int, clusterCol: String = "cluster"): DataFrame = {
    val centroids = kmeansCentroids(df, idCol, vecCol, k, maxIter)
    val vec = transform(col(vecCol), _.cast("double"))
    df.withColumn(clusterCol, assign(vec, centroids))
  }

  /** Within-cluster semantic near-duplicate pairs: cluster with
    * [[kmeans]], then score cosine ONLY for same-cluster id-ordered
    * pairs — the SemDeDup candidate generation. The join key is the
    * cluster id, so pair work is bounded by the largest cluster, never
    * n². Cosine is compared on the micro grid (engine-stable cut).
    * Returns (id_a, id_b, cluster, cosine). */
  def semDupPairs(df: DataFrame, idCol: String, vecCol: String, k: Int,
                  maxIter: Int, minCosine: Double): DataFrame = {
    val assigned = kmeans(df, idCol, vecCol, k, maxIter, "__sd_c")
      .select(col(idCol).as("__sd_id"),
        transform(col(vecCol), _.cast("double")).as("__sd_v"),
        col("__sd_c"))
    val a = assigned.select(col("__sd_id").as("id_a"),
      col("__sd_v").as("va"), col("__sd_c").as("cluster"))
    val b = assigned.select(col("__sd_id").as("id_b"),
      col("__sd_v").as("vb"), col("__sd_c").as("cluster"))
    a.join(b, Seq("cluster")).where(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("va"), col("vb")))
      .where(microL(col("cosine")) >=
        lit(math.floor(minCosine * 1e6 + 0.5).toLong))
      .select(col("id_a"), col("id_b"), col("cluster"), col("cosine"))
  }

  /** SemDeDup: keep one representative per semantic-duplicate component
    * (transitive closure of [[semDupPairs]], representative chosen by
    * `orderBy` then ascending id — never greedy pair deletion). */
  def semDedup(df: DataFrame, idCol: String, vecCol: String, k: Int,
               maxIter: Int, minCosine: Double,
               orderBy: Seq[Column] = Nil): DataFrame = {
    val pairs = semDupPairs(df, idCol, vecCol, k, maxIter, minCosine)
    DupClusters.dedupByCluster(df, idCol, pairs, "id_a", "id_b", orderBy)
  }
}
