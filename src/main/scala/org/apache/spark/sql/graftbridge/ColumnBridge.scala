package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column implementation-agnostic; the Expression<->Column
  * converters live in `private[sql]` ExpressionUtils. This shim sits in
  * an org.apache.spark.sql subpackage to re-export just those two
  * functions for graft's custom Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
