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

  /** EAGER Column → Expression: fully converts the ColumnNode tree to a
    * real Catalyst expression. [[expression]] wraps LAZILY in an
    * Unevaluable ColumnNodeExpression that only dataset-API analysis
    * unwraps — injected anywhere else (e.g. a FunctionRegistry builder's
    * return value) it survives to codegen and fails there. Use this for
    * SQL function builders. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}

/**
 * Type-surface bridge: `AbstractDataType`/`TypeCollection` are
 * `private[sql]` at the Scala level (public bytecode), so an expression
 * outside the sql namespace cannot write an `inputTypes` override
 * directly — same idiom as [[ColumnBridge]].
 */
object TypesBridge {
  /** The two-sided vector-input contract: float/double arrays accepted
    * natively, anything castable (int/decimal/null-typed literals) gets
    * one analyzer-inserted cast to array<double>. */
  def vectorVectorInputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] = {
    import org.apache.spark.sql.types._
    Seq(TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)),
      TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
  }

  /** [[vectorVectorInputTypes]] plus an integer third argument (the
    * sub-quantizer index of [[graft.functions.PqNearestCode]]). */
  def vectorVectorIntInputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    vectorVectorInputTypes :+ org.apache.spark.sql.types.IntegerType
}
