package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypesBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expression: the dot product of two vector columns —
 * exactly `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, _ + _)` (the
 * HOF formulation this replaces) but computed in one pass over the two
 * arrays with no intermediate product array.
 *
 * This is the hottest arithmetic in the engine: every cosine in the
 * similarity family folds one of these per (row, probe/center) pair —
 * the 100× k-means probe alone evaluates ~10⁸ of them (50k training
 * vectors × 1000 centers × 2 rounds), and the HOF form allocates a
 * 64-double array and runs two codegen'd loops per evaluation. Same
 * justification as [[Md5Prefix28]] (SURVEY §7.2): a custom expression
 * only where composition demonstrably pays per-row costs at corpus
 * scale.
 *
 * Semantics are the HOF's exactly, so every oracle stays bit-identical:
 * left-fold in index order over double-widened elements (same IEEE op
 * sequence), empty arrays → 0.0, and NULL when the lengths differ or
 * any element is NULL (zip_with pads the shorter side with nulls and
 * `acc + null` poisons the whole fold).
 */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  // float/double arrays evaluate natively (the hot path — no cast, no
  // intermediate array); anything else castable (array<int>, decimal
  // literals from SQL, the empty array() NullType literal) gets ONE
  // analyzer-inserted Cast to array<double> — the same widening the HOF
  // formulation's per-element transform-cast used to do, preserving the
  // pre-ArrayDot accepted-type surface for dot_product/cosine_sim SQL
  // callers
  override def inputTypes = TypesBridge.vectorVectorInputTypes

  private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.evalBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  // call through MODULE$ — same Janino static-forwarder caveat as
  // Md5Prefix28 (the case class inherits Expression.eval)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $r = graft.functions.ArrayDot$$.MODULE$$.evalBoxed(
         |  $a, $b, $leftFloat, $rightFloat);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** The fold; null (boxed) mirrors the HOF's null poisoning. */
  def evalBoxed(a: ArrayData, b: ArrayData, aFloat: Boolean,
                bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
