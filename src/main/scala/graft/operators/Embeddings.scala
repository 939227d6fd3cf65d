package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column operations for training-data pipelines: unit
  * normalization, per-group mean pooling (cluster / source centroids),
  * and PCA dimensionality reduction — the vector-hygiene steps that sit
  * between ingest and the ANN / near-dup family (Similarity.scala).
  *
  * Scale shape: normalization is row-local (zero shuffle); mean pooling
  * is one (group, dim) aggregation whose shuffle carries dims doubles
  * per group — not vectors per row — thanks to map-side partial sums;
  * PCA's covariance is a distributed treeAggregate with O(dims^2)
  * driver-side state (fine to dims ~10^4, documented below).
  */
object Embeddings {

  /** L2-normalize to a unit vector; a zero vector maps to all zeros.
    * Elements are cast to double BEFORE the norm fold so the arithmetic
    * is pure double end-to-end (a float*float square would round twice
    * and diverge from any double-side oracle). The norm is bound ONCE as
    * a lambda variable — referencing the norm expression inside the
    * per-element lambda would recompute the whole fold per element
    * (interpreted HOFs have no CSE; measured 40-200x on the dedup
    * family). */
  def normalizeL2(vec: Column): Column = {
    val dv = transform(vec, _.cast("double"))
    element_at(
      transform(array(graft.operators.Similarity.l2norm(dv)), n =>
        transform(dv, x =>
          when(n === 0.0, lit(0.0)).otherwise(x / n))), 1)
  }

  /** Element-wise mean vector per group, long format: one row per
    * (group..., dim, mean) with dim 0-based. Per-dimension sums run
    * through DECIMAL(18,9), so the mean is exact and order-independent
    * (bit-stable across partitionings and engines — the repo's moneySum
    * rule); the division back to double happens once per group-dim. */
  def meanPoolLong(df: DataFrame, groupCols: Seq[String],
                   vecCol: String): DataFrame = {
    require(groupCols.nonEmpty, "meanPoolLong needs at least one group column")
    df.select(groupCols.map(col) :+
        posexplode(transform(col(vecCol), _.cast("double"))): _*)
      .withColumnRenamed("pos", "dim")
      .withColumnRenamed("col", "__v")
      .groupBy(groupCols.map(col) :+ col("dim"): _*)
      .agg((sum(col("__v").cast("decimal(18,9)")).cast("double") /
        count(lit(1))).as("mean"))
  }

  /** [[meanPoolLong]] reassembled to one centroid array per group
    * (deterministic: dims sort inside the struct before extraction). */
  def meanPool(df: DataFrame, groupCols: Seq[String],
               vecCol: String, outCol: String = "centroid"): DataFrame =
    meanPoolLong(df, groupCols, vecCol)
      .groupBy(groupCols.map(col): _*)
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("mean")))),
        s => s.getField("mean")).as(outCol))

  /** Project embeddings onto their top-k principal components (Spark ML
    * PCA). The covariance accumulates distributed (treeAggregate); the
    * dims x dims eigendecomposition runs on the driver — bounded by
    * embedding width (O(dims^2) memory, fine to ~10^4 dims), never by
    * corpus size. Component signs/values depend on the input's float
    * summation order, so outputs are deterministic per layout but not
    * bit-portable across engines — gate rows-only, pin semantics in
    * specs (variance ordering, orthonormality). */
  def pcaProject(df: DataFrame, idCols: Seq[String], vecCol: String,
                 k: Int, outCol: String = "projected"): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    require(k > 0, s"pcaProject: k must be positive, got $k")
    val withVec = df.withColumn("__v",
      array_to_vector(transform(col(vecCol), _.cast("double"))))
    val model = new PCA().setInputCol("__v").setOutputCol("__p").setK(k)
      .fit(withVec)
    model.transform(withVec)
      .select(idCols.map(col) :+ vector_to_array(col("__p")).as(outCol): _*)
  }

  /** Scalar int8 quantization, per-vector min/max affine code — the 4x
    * memory cut that makes a 10^10-vector ANN index executor-resident.
    * Returns struct(lo, step, q: array<tinyint>) with
    * x ~ lo + step * (q + 128). Codes use floor(u + 0.5) round-half-up
    * so any engine reproduces them bit-for-bit from the same doubles.
    * A constant vector (mx == mn) has step 0 and all-(-128) codes —
    * dequantizes exactly to lo. The (min, max) pair is bound ONCE via a
    * 1-element struct transform (the repo's HOF-binding idiom — an
    * unbound reference would re-fold the array min/max per element).
    * Row-local, zero shuffles; pure double arithmetic. */
  def quantizeInt8(vec: Column): Column = {
    val dv = transform(vec, _.cast("double"))
    element_at(transform(
      array(struct(array_min(dv).as("mn"), array_max(dv).as("mx"))),
      b => {
        val mn = b.getField("mn")
        val step = ((b.getField("mx") - mn) / lit(255.0)).as("step")
        struct(
          mn.as("lo"),
          step.as("step"),
          transform(dv, x =>
            when(step === 0.0, lit(-128).cast("byte"))
              .otherwise((floor((x - mn) / step + lit(0.5)) - 128)
                .cast("byte"))).as("q"))
      }), 1)
  }

  /** Inverse of [[quantizeInt8]]: array<double> reconstruction
    * lo + step * (code + 128). Max error is step/2 ~ (mx-mn)/510 per
    * element. Row-local. */
  def dequantizeInt8(qz: Column): Column =
    transform(qz.getField("q"), c =>
      qz.getField("lo") +
        qz.getField("step") * (c.cast("double") + lit(128.0)))
}
