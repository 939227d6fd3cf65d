package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression,
  ExpressionInfo}

/** SparkSessionExtensions entry point registering the engine's native
  * Catalyst expressions as SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * programmatically via `SparkSession.builder.withExtensions(new
  * GraftExtensions)` — after which `SELECT graft_norm_cdf(z)` works in
  * SQL and `expr("graft_norm_cdf(z)")` in the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.normCdfDescriptor)
  }
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val normCdfDescriptor: FunctionDescription = (
    FunctionIdentifier("graft_norm_cdf"),
    new ExpressionInfo(classOf[NormalCdf].getName, "graft_norm_cdf"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        s"graft_norm_cdf expects 1 argument, got ${children.size}")
      NormalCdf(children.head)
    })

  /** Register on an existing session (tests / REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = normCdfDescriptor
    spark.sessionState.functionRegistry
      .registerFunction(id, info, builder)
  }
}
