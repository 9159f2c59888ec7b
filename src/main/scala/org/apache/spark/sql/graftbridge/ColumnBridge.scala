package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ⇄ Expression bridge. Spark 4 gates these behind `private[sql]`;
  * custom Catalyst expressions (the documented extension point) still need
  * them, so this one-file shim lives under the sql package — the standard
  * pattern for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager Column→Expression conversion. [[expression]] returns Spark's lazy
    * `ColumnNodeExpression` wrapper, which only unwraps on the Dataset code
    * path — inside a SQL `FunctionRegistry` builder the analyzer never
    * converts it (it analyzes as an unresolved void leaf). Function builders
    * must convert eagerly so the returned tree is plain Catalyst nodes the
    * SQL analyzer can resolve.
    */
  def resolvedExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
