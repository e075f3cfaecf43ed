package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (the
  * standard extension-library shim: Spark 4 moved these behind the
  * classic/connect split). Lets the engine wrap custom Catalyst
  * expressions as first-class `Column`s without SQL-string detours. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Error-parity shim: `private[sql]` error constructors the native
  * expressions must reproduce exactly (AdcFold's index-0 contract
  * matches try_element_at, which throws INVALID_INDEX_OF_ZERO even in
  * try mode). */
object ErrorBridge {
  def invalidIndexOfZero(): Nothing =
    throw org.apache.spark.sql.errors.QueryExecutionErrors
      .invalidIndexOfZeroError(null)
}
