package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's `private[sql]` Column↔Expression converters.
  * Lives under `org.apache.spark.sql` so the classic converter is in scope;
  * this is the supported classic-mode path for exposing custom Catalyst
  * expressions as `Column`s (ExpressionUtils in columnNodeSupport.scala). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Test-only: apply a SparkSessionExtensions' injected functions to a
    * registry (the `private[sql]` path the session builder itself uses). */
  def registerExtensions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
    : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(reg)
}
