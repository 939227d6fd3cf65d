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

  /** Per-row SRP band-bucket kernel (called from generated code).
    * `planes` is row-major (nPlanes x dims). Mirrors the HOF per-plane
    * fold exactly: a null vector, a length mismatch with the plane
    * literal, or any null element makes every dot product null
    * (zip_with null-pads), and the when(d >= 0) guard then drops every
    * bit to 0 — so those rows land in bucket 0 of every band. */
  def srpBuckets(vec: ArrayData, planes: Array[Double], dims: Int,
                 bands: Int, bitsPerBand: Int): ArrayData = {
    val out = new Array[Any](bands)
    val degenerate = vec == null || vec.numElements() != dims || {
      var i = 0; var hasNull = false
      while (i < dims && !hasNull) { hasNull = vec.isNullAt(i); i += 1 }
      hasNull
    }
    var b = 0
    while (b < bands) {
      var bucket = 0L
      if (!degenerate) {
        var i = 0
        while (i < bitsPerBand) {
          val base = (b * bitsPerBand + i) * dims
          var d = 0.0; var j = 0
          while (j < dims) { d += vec.getDouble(j) * planes(base + j); j += 1 }
          if (d >= 0) bucket |= (1L << i)
          i += 1
        }
      }
      out(b) = java.lang.Long.valueOf(bucket)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Per-row argmin-squared-L2 kernel (called from generated code).
    * `cents` is row-major (k x dims). Mirrors the HOF
    * array_min(array(struct(microL(aggregate(zip_with(...))), i)))
    * composition bit-for-bit: left-to-right (x-c)^2 double accumulation
    * from 0.0, micro-rounding as Math.floor(d*1e6+0.5) cast to long
    * (Spark's non-ANSI double->long cast), argmin with ties to the
    * smaller index. Degenerate rows — a null vector, a length mismatch
    * with the centroid literals, or any null element — make EVERY
    * centroid's distance null (zip_with null-pads, the fold poisons),
    * and the struct ordering then picks (null, 0): index 0, exactly the
    * HOF fall-through. Never null, so custom codegen with a false
    * isNull. */
  def argMinL2Micro(vec: ArrayData, cents: Array[Double],
                    dims: Int): Int = {
    val degenerate = vec == null || vec.numElements() != dims || {
      var i = 0; var hasNull = false
      while (i < dims && !hasNull) { hasNull = vec.isNullAt(i); i += 1 }
      hasNull
    }
    if (degenerate) return 0
    val k = cents.length / dims
    var best = Long.MaxValue
    var bestI = 0
    var c = 0
    while (c < k) {
      var acc = 0.0
      var j = 0
      val base = c * dims
      while (j < dims) {
        val diff = vec.getDouble(j) - cents(base + j)
        acc += diff * diff
        j += 1
      }
      val micro = Math.floor(acc * 1e6 + 0.5).toLong
      if (micro < best) { best = micro; bestI = c }
      c += 1
    }
    bestI
  }

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

/** SRP band-bucket array over an embedding column: band b's bucket packs
  * the sign bits of its own plane slice. Planes are carried FLATTENED as
  * a Seq (case-class structural equality keeps plan canonicalization
  * sound; an Array field would compare by reference) and bound to a
  * primitive array once per executor. Never null: degenerate rows (null /
  * ragged / null-element vectors) get bucket 0 in every band, exactly
  * like the HOF when-guard fall-through — so custom codegen, not
  * defineCodeGen. */
case class SrpBandBucketsExpr(child: Expression, planes: Seq[Double],
                              dims: Int, bands: Int, bitsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  require(planes.length == bands * bitsPerBand * dims,
    s"planes must be (bands*bitsPerBand)x(dims) flattened: " +
      s"${planes.length} != ${bands * bitsPerBand} * $dims")

  @transient private lazy val planeArr: Array[Double] = planes.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<DOUBLE>, got ${other.sql}")
    }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_srp_buckets"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    VectorKernels.srpBuckets(
      if (v == null) null else v.asInstanceOf[ArrayData],
      planeArr, dims, bands, bitsPerBand)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val planesRef = ctx.addReferenceObj("graftSrpPlanes", planeArr,
      "double[]")
    val c = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    ev.copy(code = c.code +
      code"""
        $javaType ${ev.value} = graft.plans.VectorKernels.srpBuckets(
          ${c.isNull} ? null : ${c.value}, $planesRef, $dims, $bands,
          $bitsPerBand);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SrpBandBucketsExpr = copy(child = newChild)
}

/** Argmin centroid index over an embedding column: the assignment step
  * of the deterministic k-means family (Clustering.assign's native face
  * — flat k-means, SemDeDup, PQ train/encode all ride it). Centroids
  * are carried FLATTENED row-major as a Seq (structural equality for
  * plan canonicalization, as SrpBandBucketsExpr) and bound to a
  * primitive array once per executor. The HOF twin it replaces walked
  * k interpreted zip_with/aggregate folds per row AND carried a
  * ~k*dims-node expression tree through every plan (planning cost per
  * bench rep); this is one expression node and one fused while-loop.
  * Never null: degenerate rows resolve to index 0 exactly like the
  * HOF's struct ordering (see the kernel doc). */
case class ArgMinL2MicroExpr(child: Expression, centroids: Seq[Double],
                             dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  require(dims > 0, s"dims must be positive, got $dims")
  require(centroids.nonEmpty && centroids.length % dims == 0,
    s"centroids must be k x dims flattened: ${centroids.length} " +
      s"not a multiple of $dims")

  @transient private lazy val centArr: Array[Double] = centroids.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<DOUBLE>, got ${other.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_argmin_l2_micro"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    VectorKernels.argMinL2Micro(
      if (v == null) null else v.asInstanceOf[ArrayData], centArr, dims)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val centsRef = ctx.addReferenceObj("graftArgminCents", centArr,
      "double[]")
    val c = child.genCode(ctx)
    ev.copy(code = c.code +
      code"""
        int ${ev.value} = graft.plans.VectorKernels.argMinL2Micro(
          ${c.isNull} ? null : ${c.value}, $centsRef, $dims);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ArgMinL2MicroExpr = copy(child = newChild)
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
