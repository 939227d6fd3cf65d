package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the standard normal CDF Φ(x) — the one
  * scalar the Sharpe-test p-value needs that `functions._` lacks
  * (SURVEY §4.3 / §2.11.4). Implemented as a `UnaryExpression` WITH
  * `doGenCode`, so unlike a Scala UDF it stays inside whole-stage codegen
  * (no Row boxing, no codegen-fallback seam) — the pattern to follow for
  * any future hot-path scalar the reference needs.
  *
  * Numerics: Φ(x) = 0.5 * erfc(-x / √2) via commons-math3's Erf (double
  * precision over the full range; the p-value path uses erfc directly to
  * avoid the 1-Φ cancellation for large |x|).
  */
case class NormalCdf(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_norm_cdf requires DOUBLE, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm_cdf"

  override def nullSafeEval(input: Any): Any =
    NormalCdf.phi(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.NormalCdf.phi($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : NormalCdf = copy(child = newChild)
}

object NormalCdf {
  /** Φ(x) = erfc(-x/√2)/2 — stable in both tails. */
  def phi(x: Double): Double =
    0.5 * org.apache.commons.math3.special.Erf.erfc(-x / math.sqrt(2.0))
}
