package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Linear-regression operators (SURVEY §2.9 M5-M7).
  *
  * The reference approximates OLS with chunked SGD
  * (`/root/reference/chunk_pipeline.py:246-351`) purely as a memory
  * workaround; we standardize on EXACT OLS (SURVEY §7.4.4):
  *
  *  - [[simpleOlsByGroup]]: single-regressor OLS per group from native
  *    `regr_*` aggregates — one shuffle, SQL-oracle-checkable.
  *  - [[olsByGroup]]: k-regressor OLS per group via power-sum accumulation
  *    of X'X / X'y in ONE map-side-combinable agg pass, then a per-group
  *    closed-form solve (commons-math3) on the tiny collected result. This
  *    is the scale shape: the 100 TB scan reduces to one row of k(k+1)/2+k
  *    sums per group before anything leaves the executors; only
  *    (groups x k^2) numbers hit the driver.
  *
  * t-values and adjusted R^2 follow `chunk_pipeline.py:201-243`:
  * se = sqrt(sigma^2 diag((X'X)^-1)), t = beta/se,
  * adjR2 = 1-(1-R2)(n-1)/(n-p-1).
  */
object Regression {

  /** Per-group simple OLS y ~ x: slope, intercept, r2, n. */
  def simpleOlsByGroup(df: DataFrame, y: String, x: String,
                       groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*).agg(
      regr_slope(col(y), col(x)).as("slope"),
      regr_intercept(col(y), col(x)).as("intercept"),
      regr_r2(col(y), col(x)).as("r2"),
      regr_count(col(y), col(x)).as("n"))

  /** Result row of a multi-regressor fit. `xtxInv` (row-major, (k+1)²,
    * intercept first) and `sigma2` feed the M13 diagnostics. */
  final case class OlsFit(group: Seq[Any], intercept: Double,
                          coefs: Array[Double], tValues: Array[Double],
                          interceptT: Double, r2: Double, adjR2: Double,
                          n: Long, xtxInv: Array[Double] = Array.empty,
                          sigma2: Double = Double.NaN)

  /** Exact k-regressor OLS (with intercept) per group. Design matrix
    * moments are accumulated distributedly; normal equations are solved on
    * the driver per group (k is small: the reference uses <= 8 regressors).
    */
  def olsByGroup(df: DataFrame, y: String, xs: Seq[String],
                 groupCols: Seq[String]): Seq[OlsFit] = {
    val k = xs.size
    // augmented regressor list: x0 = 1 (intercept)
    val cols: Seq[Column] = lit(1.0) +: xs.map(c => col(c).cast("double"))
    val yc = col(y).cast("double")
    var aggs = Seq.empty[Column]
    for (i <- 0 to k; j <- i to k)
      aggs :+= sum(cols(i) * cols(j)).as(s"xx_${i}_$j")
    for (i <- 0 to k) aggs :+= sum(cols(i) * yc).as(s"xy_$i")
    aggs :+= sum(yc * yc).as("yy")
    aggs :+= count(lit(1)).as("n")
    val grouped =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    grouped.collect().toSeq.map { row =>
      solveRow(row, k, groupCols)
    }
  }

  private def solveRow(row: Row, k: Int, groupCols: Seq[String]): OlsFit = {
    import org.apache.commons.math3.linear._
    val p = k + 1
    val xtx = new Array2DRowRealMatrix(p, p)
    for (i <- 0 to k; j <- i to k) {
      val v = row.getAs[Double](s"xx_${i}_$j")
      xtx.setEntry(i, j, v); xtx.setEntry(j, i, v)
    }
    val xty = new ArrayRealVector(p)
    for (i <- 0 to k) xty.setEntry(i, row.getAs[Double](s"xy_$i"))
    val yy = row.getAs[Double]("yy")
    val n = row.getAs[Long]("n")
    val solver = new QRDecomposition(xtx).getSolver
    val beta = solver.solve(xty)
    val xtxInv = solver.getInverse
    // RSS = y'y - 2 b'X'y + b'X'X b ; TSS = y'y - n*mean^2
    val rss = yy - 2.0 * beta.dotProduct(xty) +
      beta.dotProduct(xtx.operate(beta))
    val meanY = row.getAs[Double]("xy_0") / n
    val tss = yy - n * meanY * meanY
    val dof = n - p
    val sigma2 = rss / dof
    val se = (0 to k).map(i => math.sqrt(sigma2 * xtxInv.getEntry(i, i)))
    val t = (0 to k).map(i => beta.getEntry(i) / se(i))
    val r2 = if (tss > 0) 1.0 - rss / tss else Double.NaN
    val adjR2 = 1.0 - (1.0 - r2) * (n - 1).toDouble / dof
    val groupVals = groupCols.map(c => row.getAs[Any](c))
    val inv = (for (i <- 0 to k; j <- 0 to k)
      yield xtxInv.getEntry(i, j)).toArray
    OlsFit(groupVals, beta.getEntry(0),
      (1 to k).map(beta.getEntry).toArray,
      (1 to k).map(t).toArray, t(0), r2, adjR2, n, inv, sigma2)
  }

  /** M13 regression-diagnostic columns for a fitted model
    * (`/root/reference/order_imbalance.py:603-670`): fitted value,
    * residual, leverage h_ii = x'(X'X)⁻¹x, standardized residual, and
    * Cook's distance D = e² h / (p σ² (1-h)²). Pure row-local arithmetic
    * over the broadcast (k+1)² inverse — scales as a map. */
  def diagnostics(df: DataFrame, y: String, xs: Seq[String], fit: OlsFit)
      : DataFrame = {
    val p = xs.size + 1
    require(fit.xtxInv.length == p * p,
      s"fit carries no inverse for ${xs.size} regressors")
    val cols: Seq[Column] = lit(1.0) +: xs.map(c => col(c).cast("double"))
    val yhat = xs.zip(fit.coefs).foldLeft(lit(fit.intercept)) {
      case (acc, (x, b)) => acc + col(x).cast("double") * lit(b)
    }
    def inv(i: Int, j: Int) = fit.xtxInv(i * p + j)
    val leverage = (for (i <- 0 until p; j <- 0 until p)
      yield cols(i) * cols(j) * lit(inv(i, j))).reduce(_ + _)
    val resid = col(y).cast("double") - yhat
    df.withColumn("fitted", yhat)
      .withColumn("residual", resid)
      .withColumn("leverage", leverage)
      .withColumn("std_residual",
        col("residual") / sqrt(lit(fit.sigma2) * (lit(1.0) - col("leverage"))))
      .withColumn("cooks_d",
        col("residual") * col("residual") * col("leverage") /
          (lit(p * fit.sigma2) *
            (lit(1.0) - col("leverage")) * (lit(1.0) - col("leverage"))))
  }
}
