package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public `Column(Expression)` constructor (the Column
  * API is connect-unified over ColumnNode); the classic-session builder
  * `classic.ExpressionUtils.column` is `private[sql]`. This one-liner in
  * the sql package namespace is the supported-shape interop bridge for a
  * library that ships its own native Catalyst expressions (graft.plans.*)
  * and needs to expose them as Columns without registering session
  * functions first. No Spark internals are modified or shadowed. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
