package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst kernel for pairwise cosine similarity — the per-pair
  * scoring loop of the ANN family (bruteForceTopK / lshTopK / ivfTopK
  * candidates). The higher-order formulation walks three interpreted
  * folds (zip_with product, two norm aggregates) per pair; this is one
  * fused primitive while-loop with left-to-right summation, bit-identical
  * to the fold (and therefore to the DuckDB oracle the q_ann_cosine gate
  * hash-matches).
  *
  * Null contract mirrors the HOF exactly: null either side, a null
  * element, a length mismatch (zip_with null-pads -> null product), or a
  * zero norm (the when() guard) all yield NULL — so the kernel can turn
  * non-null inputs into null and carries nullSafeCodeGen with an explicit
  * isNull store instead of defineCodeGen. */
object VectorKernels {

  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na > 0 && nb > 0)
      java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    else null
  }
}

case class CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  private def ok(dt: DataType) = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE>, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r =
         |  graft.plans.VectorKernels.cosine($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineExpr =
    copy(left = newLeft, right = newRight)
}
