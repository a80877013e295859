package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, SQLOrderingUtil}
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypesBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/**
 * Native Catalyst expression: the nearest PQ code for subvector `sv`
 * under the flat codebook `cbFlat` at sub-quantizer `j` — exactly
 *
 *   array_min(transform(sequence(0, ksub-1), c =>
 *     struct(aggregate(zip_with(sv, slice(cbFlat, (j*ksub+c)*sd+1, sd),
 *                               (a, b) => (a-b)*(a-b)),
 *                      0.0, (acc, x) => acc + x).as("d"),
 *            c.as("code")))).getField("code")
 *
 * (the HOF formulation this replaces) but computed in one pass with no
 * intermediate struct array and no interpreted lambda dispatch. This is
 * the PQ family's hottest arithmetic: every encode evaluates m of these
 * per row and each one folds ksub × sd multiply-adds — m·ksub·dims ops
 * per vector (1,024 at the contract's 8×16×64 shape) that the HOF form
 * runs through boxed lambda machinery ("the library's most CPU-dense
 * narrow map", [[Similarity.pqEncode]]). Same justification as
 * [[ArrayDot]] / [[Md5Prefix28]] (SURVEY §7.2): a custom expression only
 * where composition demonstrably pays per-row costs at corpus scale.
 *
 * Semantics are the HOF's exactly, bit for bit, so every PQ oracle row
 * stays engine-identical (Round16OpsSpec pins the parity on random,
 * null-bearing, NaN-bearing and ragged inputs):
 *
 *  - each candidate distance is the left fold, in index order, of the
 *    double-widened squared differences — identical IEEE op sequence;
 *  - `slice` beyond the codebook's end shortens the window, `zip_with`
 *    pads the shorter side with nulls, and a null term poisons the fold
 *    (`acc + null`): any such candidate carries a NULL distance, and
 *    struct ordering puts NULLs FIRST ascending — so the LOWEST code
 *    with a null distance wins outright (a null `sv`, `cbFlat` or `j`
 *    nulls every candidate: code 0);
 *  - both empty windows fold to 0.0 (aggregate over an empty array);
 *  - ties and NaNs follow Spark's total order on double (NaN largest,
 *    ties to the smaller code — struct comparison (d ASC, code ASC)).
 */
case class PqNearestCode(sv: Expression, cbFlat: Expression, j: Expression,
                         ksub: Int, sd: Int)
    extends TernaryExpression with ImplicitCastInputTypes {
  require(ksub >= 1 && sd >= 1, s"ksub=$ksub sd=$sd")

  override def first: Expression = sv
  override def second: Expression = cbFlat
  override def third: Expression = j
  override def dataType: DataType = IntegerType
  // never null: sequence(0, ksub-1) is non-empty, so array_min always
  // finds a struct (null inputs surface as code 0, not as NULL)
  override def nullable: Boolean = false
  override def prettyName: String = "pq_nearest_code"

  override def inputTypes = TypesBridge.vectorVectorIntInputTypes

  private lazy val svFloat =
    sv.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val cbFloat =
    cbFlat.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val svV = sv.eval(input)
    val cbV = cbFlat.eval(input)
    val jV = j.eval(input)
    PqNearestCode.evalCode(
      svV.asInstanceOf[ArrayData], cbV.asInstanceOf[ArrayData],
      jV == null, if (jV == null) 0 else jV.asInstanceOf[Int],
      ksub, sd, svFloat, cbFloat)
  }

  // call through MODULE$ — same Janino static-forwarder caveat as
  // Md5Prefix28 (the case class inherits Expression.eval)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val svG = sv.genCode(ctx)
    val cbG = cbFlat.genCode(ctx)
    val jG = j.genCode(ctx)
    ev.copy(code =
      code"""
         |${svG.code}
         |${cbG.code}
         |${jG.code}
         |int ${ev.value} = graft.functions.PqNearestCode$$.MODULE$$.evalCode(
         |  ${svG.isNull} ? null : ${svG.value},
         |  ${cbG.isNull} ? null : ${cbG.value},
         |  ${jG.isNull}, ${jG.isNull} ? 0 : (int) ${jG.value},
         |  $ksub, $sd, $svFloat, $cbFloat);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqNearestCode =
    copy(sv = newFirst, cbFlat = newSecond, j = newThird)
}

object PqNearestCode {
  /**
   * The argmin. A null `d` candidate (null input, null element, or a
   * window the other side cannot match) sorts BEFORE every non-null
   * distance (struct ordering, nulls first), and among null-d candidates
   * the smallest code wins — iterating codes in ascending order, the
   * first null encountered is the overall minimum, so return there.
   * Non-null distances compare under Spark's total order on double
   * ([[SQLOrderingUtil.compareDoubles]]: NaN largest, NaN == NaN), with
   * strict-less keeping the earliest (smallest) code on ties.
   */
  def evalCode(sv: ArrayData, cb: ArrayData, jNull: Boolean, j: Int,
               ksub: Int, sd: Int, svFloat: Boolean,
               cbFloat: Boolean): Int = {
    if (sv == null || cb == null || jNull || j < 0) return 0
    val svLen = sv.numElements()
    val cbLen = cb.numElements()
    var bestCode = 0
    var bestD = 0.0
    var haveBest = false
    var c = 0
    while (c < ksub) {
      val start = (j * ksub + c) * sd
      // slice((j*ksub+c)*sd+1, sd): [start, start+sd) clamped to cbLen
      val sliceLen = {
        val w = math.min(cbLen - start, sd)
        if (w < 0) 0 else w
      }
      // zip_with runs to the LONGER side, padding the shorter with null
      val n = math.max(svLen, sliceLen)
      var acc = 0.0
      var isNull = false
      var i = 0
      while (i < n && !isNull) {
        if (i >= svLen || i >= sliceLen ||
            sv.isNullAt(i) || cb.isNullAt(start + i)) {
          isNull = true
        } else {
          val a = if (svFloat) sv.getFloat(i).toDouble else sv.getDouble(i)
          val b = if (cbFloat) cb.getFloat(start + i).toDouble
                  else cb.getDouble(start + i)
          val d = a - b
          acc += d * d
        }
        i += 1
      }
      if (isNull) return c
      if (!haveBest || SQLOrderingUtil.compareDoubles(acc, bestD) < 0) {
        haveBest = true
        bestD = acc
        bestCode = c
      }
      c += 1
    }
    bestCode
  }

  def apply(sv: Column, cbFlat: Column, j: Column, ksub: Int,
            sd: Int): Column =
    ColumnBridge.column(PqNearestCode(ColumnBridge.expression(sv),
      ColumnBridge.expression(cbFlat), ColumnBridge.expression(j),
      ksub, sd))
}
