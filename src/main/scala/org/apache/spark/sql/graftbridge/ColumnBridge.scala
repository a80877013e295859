package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Expression bridge. Spark 4 hides the classic converters behind
 * `private[sql]` (the Column API is Connect-agnostic); extensions that
 * contribute native Catalyst expressions use a same-namespace bridge —
 * the standard idiom for SparkSessionExtensions-style libraries.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
