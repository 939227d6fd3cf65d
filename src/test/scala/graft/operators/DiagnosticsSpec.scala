package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** M13 regression diagnostics: residual/leverage/Cook columns. */
class DiagnosticsSpec extends SparkSpec {

  test("diagnostics: residuals, leverage, Cook's distance on tiny fixture") {
    // x = 1..4, y = 1,3,2,4 -> beta=(0.5, 0.8), sigma2=0.9 (RegressionSpec)
    val d = df("x DOUBLE, y DOUBLE",
      Row(1.0, 1.0), Row(2.0, 3.0), Row(3.0, 2.0), Row(4.0, 4.0))
    val fit = Regression.olsByGroup(d, "y", Seq("x"), Nil).head
    val out = Regression.diagnostics(d, "y", Seq("x"), fit)
      .orderBy(col("x")).collect()
    // residuals: -0.3, 0.9, -0.9, 0.3
    val resid = out.map(_.getAs[Double]("residual"))
    Seq(-0.3, 0.9, -0.9, 0.3).zip(resid).foreach { case (e, a) =>
      assertApprox(a, e, 1e-10)
    }
    // leverage for simple regression: h_i = 1/n + (x-xbar)^2/Sxx
    // n=4, xbar=2.5, Sxx=5 -> h = .25 + (x-2.5)^2/5
    val lev = out.map(_.getAs[Double]("leverage"))
    Seq(1.0, 2.0, 3.0, 4.0).zip(lev).foreach { case (x, h) =>
      assertApprox(h, 0.25 + (x - 2.5) * (x - 2.5) / 5.0, 1e-10)
    }
    // leverages sum to p
    assertApprox(lev.sum, 2.0, 1e-10)
    // Cook's D spot-check at x=2: e=.9, h=.3, p=2, s2=.9
    val d2 = out(1).getAs[Double]("cooks_d")
    assertApprox(d2, 0.81 * 0.3 / (2 * 0.9 * 0.7 * 0.7), 1e-10)
  }

  test("leverage/Cook finite and fitted+residual reconstructs y") {
    val rng = new scala.util.Random(5)
    val rows = (1 to 100).map { _ =>
      val x1 = rng.nextDouble() * 10; val x2 = rng.nextGaussian()
      Row(x1, x2, 1.0 + 0.5 * x1 - 2.0 * x2 + rng.nextGaussian() * 0.1)
    }
    val d = df("x1 DOUBLE, x2 DOUBLE, y DOUBLE", rows: _*)
    val fit = Regression.olsByGroup(d, "y", Seq("x1", "x2"), Nil).head
    val out = Regression.diagnostics(d, "y", Seq("x1", "x2"), fit)
    val chk = out.select(
      max(abs(col("fitted") + col("residual") - col("y"))),
      min(col("leverage")), max(col("leverage")),
      max(col("cooks_d"))).collect()(0)
    assert(chk.getDouble(0) < 1e-9)
    assert(chk.getDouble(1) > 0 && chk.getDouble(2) < 1.0)
    assert(!chk.getDouble(3).isNaN)
  }
}
