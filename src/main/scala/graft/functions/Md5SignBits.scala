package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: the SimHash bit tests of [[Dedup]] — bit j of
 * the result is 1 iff hex digit j%32 of md5(input) passes nibble-bit table
 * j/32 (tables: [[Dedup.simhashBitChars]]) — computed straight from the
 * digest bytes in ONE call, with codegen.
 *
 * The composed-builtin formulation evaluates `bits` separate
 * `substring(md5(x), …) IN (…8 chars…)` predicates per shingle — `bits`
 * hex-string materializations and 8-way string compares on the hottest
 * dedup path (one shingle stream row per shingle per document). This
 * expression is value-identical by construction: bit j = bit (3 - j/32)
 * of nibble j%32, which is exactly "digit ∈ the set of hex chars with
 * that nibble bit set". The DuckDB oracles keep the substring/IN
 * formulation; both produce identical values.
 */
case class Md5SignBits(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits=$bits out of range")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_sign_bits"

  // analysis-time contract (SQL users reach this expression directly): a
  // non-string child would otherwise fail only at execution — a Janino
  // compile error under codegen.fallback=false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    Md5SignBits.eval(input.asInstanceOf[UTF8String], bits)

  // MODULE$ call, as in Md5Prefix28: the case class inherits
  // Expression.eval(InternalRow), which suppresses the static forwarder
  // for the companion's eval — a bare `Md5SignBits.eval` would not
  // resolve under Janino and Spark would silently interpret.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5SignBits$$.MODULE$$.eval($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Md5SignBits =
    copy(child = newChild)
}

object Md5SignBits {
  private val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  /** Bit j of the result = bit (3 - j/32) of md5 nibble j%32. */
  def eval(s: UTF8String, bits: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var sig = 0L
    var j = 0
    while (j < bits) {
      val digit = j % 32
      // hex digit i is the high nibble of byte i/2 for even i, low for odd
      val nib = if ((digit & 1) == 0) (d(digit >> 1) >> 4) & 0xf
                else d(digit >> 1) & 0xf
      if (((nib >> (3 - j / 32)) & 1) == 1) sig |= 1L << j
      j += 1
    }
    sig
  }

  def apply(c: Column, bits: Int): Column =
    ColumnBridge.column(Md5SignBits(ColumnBridge.expression(c), bits))
}
