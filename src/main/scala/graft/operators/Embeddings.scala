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

  /** Deterministic top-k PCA by power iteration with deflation —
    * engine-portable where [[pcaProject]] (Spark ML / LAPACK) is not:
    * every corpus-sized or dimension-sized sum runs through
    * DECIMAL(30,12) (exact, order-independent), every scalar step
    * (normalize, sign flip, deflate) is identical IEEE double
    * arithmetic, and each component's sign is canonicalized so its
    * largest-|loading| coordinate is positive (ties to the smallest
    * dim). Same corpus + k + iters = bit-identical projections on any
    * partitioning or engine — the DuckDB oracle unrolls the same
    * iterations in SQL (the q_kmeans discipline).
    *
    * Scale shape: the covariance is ONE corpus pass — a row-local outer
    * product (the centered vector bound once per row via the HOF-binding
    * idiom) partial-aggregated map-side into d^2 cells COLLECTED to the
    * driver; the power iteration itself is driver-side arithmetic over
    * those d^2 doubles (a 64x64 matvec is microseconds — as Spark jobs
    * it was 15 s/run of pure scheduler overhead, measured at sf0.1).
    * Engine parity is preserved by construction: every "decimal sum" in
    * the iteration calls Spark's own `Decimal.changePrecision` — the
    * EXACT code path of `cast(x as decimal(30,12))` — and exact decimal
    * addition is order-independent, so the driver fold equals the SQL
    * SUM bit-for-bit. The projection is a second corpus pass joined
    * against the k*d broadcast component frame. O(d^2) driver state —
    * fine to d ~ 10^3; `iters` trades accuracy for work.
    *
    * Returns long format (idCol, comp, value): the centered projection
    * onto each canonical component, comp in [0, k). */
  def pcaPowerProject(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int): DataFrame = {
    require(k > 0, s"pcaPowerProject: k must be positive, got $k")
    require(iters >= 1, s"pcaPowerProject: iters must be >= 1, got $iters")
    val spark = df.sparkSession
    // scale 12, not 15: products stay within ~3.6e13 unscaled, so the
    // per-cell partial sums remain inside Spark's compact-long Decimal
    // fast path (scale-15 unscaled values overflowed to the BigDecimal
    // representation mid-sum — the measured cost driver of the whole
    // covariance pass); 1e-12 cell precision is 6 orders below the r6
    // output grid. Still exact + order-independent at any width.
    val Dec = "decimal(30,12)"
    val dv = transform(col(vecCol), _.cast("double"))
    // fanned wide: the covariance combiner below does d(d+1)/2 exact-
    // decimal products PER ROW — the most compute-dense row-local stage
    // in the repo — and a single-split local scan otherwise runs it on
    // one core (measured 2.05 s single-threaded vs ~0.15 s wide at
    // sf0.1). Partition-partial decimal sums are order-independent, so
    // the fan cannot change a covariance bit (graft.core.Par; no-op at
    // cluster scale).
    val base = graft.core.Par.fanOut(
      df.select(col(idCol).as("__id"), dv.as("__v")), col("__id"))
    // one probe pass, not two (count + width ride the same aggregate);
    // n counts ALL rows — the covariance divisor contract — not just
    // non-null vectors
    val probe = base.agg(count(lit(1)),
      first(size(col("__v")), ignoreNulls = true)).head()
    val n = probe.getLong(0)
    require(n > 0, "pcaPowerProject: empty input")
    val d = probe.getInt(1)

    // per-dim mean, exact decimal — d doubles to the driver
    val muRows = base
      .select(posexplode(col("__v")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg((sum(col("x").cast(Dec)).cast("double") / count(lit(1)))
        .as("m"))
      .collect()
    val mu = Array.ofDim[Double](d)
    muRows.foreach(r => mu(r.getInt(0)) = r.getDouble(1))
    val muLit = typedlit(mu.toSeq)
    val centered = zip_with(col("__v"), muLit, (x, m) => x - m)

    // covariance: ONE corpus pass with a per-partition exact-decimal
    // UPPER-TRIANGLE combiner (the treeAggregate shape — symmetry halves
    // the product mass) emitting d(d+1)/2 partial sums per partition;
    // the shuffle carries partials, never products. mapPartitions here
    // is the honest last-resort: the explode->hashAgg formulation paid
    // ~1 us of row machinery per PRODUCT (d^2/2 rows per vector —
    // measured 4-8 s at a mere 2000x64), while this loop is arithmetic
    // only. Exactness is unchanged: each product goes through the SAME
    // cast (Spark's Decimal.changePrecision = CAST(x AS DECIMAL(30,12)))
    // and exact decimal addition is order-independent, so
    // partition-partials + final decimal SUM equal the oracle's flat
    // SUM bit-for-bit.
    val nTri = d * (d + 1) / 2
    val muB = mu
    val dB = d
    import spark.implicits._
    val partials = base.select(col("__v"))
      .mapPartitions { it =>
        val acc = Array.fill(nTri)(java.math.BigDecimal.ZERO)
        var any = false
        val xc = Array.ofDim[Double](dB)
        it.foreach { row =>
          any = true
          val arr = row.getSeq[Double](0)
          var i = 0
          while (i < dB) { xc(i) = arr(i) - muB(i); i += 1 }
          var pos = 0
          i = 0
          while (i < dB) {
            var j = i
            while (j < dB) {
              val p = org.apache.spark.sql.types.Decimal(xc(i) * xc(j))
              require(p.changePrecision(30, 12),
                "pcaPowerProject: product overflows DECIMAL(30,12)")
              acc(pos) = acc(pos).add(p.toJavaBigDecimal)
              pos += 1; j += 1
            }
            i += 1
          }
        }
        if (!any) Iterator.empty
        else acc.iterator.zipWithIndex.map { case (bd, p) =>
          (p, scala.math.BigDecimal(bd))
        }
      }
      .toDF("pos", "partial")
    val triSums = partials
      .groupBy(col("pos"))
      .agg((sum(col("partial")).cast("double") / lit(n.toDouble))
        .as("c"))
      .collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val cov = Array.ofDim[Double](d * d)
    var pos = 0
    for (i <- 0 until d; j <- i until d) {
      val c = triSums(pos)
      cov(i * d + j) = c
      cov(j * d + i) = c
      pos += 1
    }

    // cast(x as decimal(30,12)) via Spark's own Decimal — the identical
    // rounding (HALF_UP on the valueOf representation) the SQL path uses
    def dec(x: Double): java.math.BigDecimal = {
      val v = org.apache.spark.sql.types.Decimal(x)
      require(v.changePrecision(30, 12),
        s"pcaPowerProject: value $x overflows DECIMAL(30,12)")
      v.toJavaBigDecimal
    }
    // SUM(CAST(term AS DECIMAL(30,12)))::DOUBLE — exact decimal addition
    // is order-independent, so this fold IS the SQL aggregate
    def decSum(terms: Iterator[Double]): Double =
      terms.foldLeft(java.math.BigDecimal.ZERO)((a, x) => a.add(dec(x)))
        .doubleValue()

    val comps = Array.ofDim[Array[Double]](k)
    for (ci <- 0 until k) {
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      for (_ <- 1 to iters) {
        val w = Array.tabulate(d)(i =>
          decSum((0 until d).iterator.map(j => cov(i * d + j) * v(j))))
        val nr = math.sqrt(decSum(w.iterator.map(x => x * x)))
        require(nr > 0.0,
          s"pcaPowerProject: zero-norm iterate at component $ci " +
            "(rank-deficient covariance; lower k)")
        v = w.map(_ / nr)
      }
      // canonical sign: largest-|loading| coordinate positive, ties to
      // the smallest dim (strict > keeps the first maximum)
      var bi = 0
      for (i <- 1 until d) if (math.abs(v(i)) > math.abs(v(bi))) bi = i
      val sg = if (v(bi) < 0) -1.0 else 1.0
      v = v.map(_ * sg)
      comps(ci) = v
      if (ci < k - 1) {
        // deflate: C <- C - lambda * v v^T, lambda = v^T C v
        val vv = v
        val lam = decSum((0 until d * d).iterator.map(p =>
          (cov(p) * vv(p / d)) * vv(p % d)))
        for (p <- 0 until d * d)
          cov(p) = cov(p) - (lam * vv(p / d)) * vv(p % d)
      }
    }

    // projection: one corpus pass against the broadcast k*d components
    import spark.implicits._
    val compDf = (for (ci <- 0 until k; dim <- 0 until d)
      yield (ci, dim, comps(ci)(dim))).toDF("comp", "dim", "cv")
    base
      .select(col("__id"), posexplode(centered).as(Seq("dim", "v")))
      .join(broadcast(compDf), "dim")
      .groupBy(col("__id"), col("comp"))
      .agg(sum((col("v") * col("cv")).cast(Dec)).cast("double")
        .as("value"))
      .select(col("__id").as(idCol), col("comp"), col("value"))
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
