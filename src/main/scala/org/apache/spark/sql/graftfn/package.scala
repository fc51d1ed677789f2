package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression conversions so
  * graft's native expressions are usable as Columns without requiring
  * every SparkSession to be built with the extensions installed. */
package object graftfn {
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = ExpressionUtils.expression(c)
}
