package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: the top 28 bits of md5(input) as a long —
 * exactly `conv(substring(md5(x), 1, 7), 16, 10)` (the first 7 hex
 * digits) but computed straight from the digest bytes, with codegen, and
 * without materializing the 32-char hex string and re-parsing it.
 *
 * This sits in the hottest dedup path (one call per shingle — billions of
 * calls at corpus scale: MinHash signatures, fingerprints), which is what
 * justifies a custom expression over composing built-ins (SURVEY §7.2).
 * The DuckDB oracles keep the hex-string formulation; both produce
 * identical values by construction.
 */
case class Md5Prefix28(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_prefix28"

  // analysis-time contract (SQL users reach this expression directly)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix28.eval(input.asInstanceOf[UTF8String])

  // NOTE: must call through MODULE$ — scalac suppresses the static forwarder
  // for the companion's eval(UTF8String) because the case class inherits
  // Expression.eval(InternalRow) (same name), so `Md5Prefix28.eval(...)`
  // does not resolve under Janino and Spark would silently fall back to
  // interpreted evaluation.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix28$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix28 =
    copy(child = newChild)
}

object Md5Prefix28 {
  private val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  /** First 28 bits of the md5 digest (== first 7 hex digits as a number). */
  def eval(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    (((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >>> 4))
  }

  def apply(c: Column): Column =
    ColumnBridge.column(Md5Prefix28(ColumnBridge.expression(c)))
}
