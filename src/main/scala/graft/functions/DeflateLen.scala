package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: the zlib-DEFLATE length of the input's
 * UTF-8 bytes (raw deflate, level 6, no header) — the classic
 * compression-ratio quality signal of large-corpus text pipelines:
 * boilerplate, repeated spans, and template text compress far below
 * natural prose, so `deflate_len / octet_length` separates low-entropy
 * documents with one number and no tokenizer.
 *
 * A custom expression for the same reason as [[Md5Prefix28]] (SURVEY
 * §7.2): one call per document on a corpus-wide pass, no builtin
 * composition exists (Spark has no compression function surface), and a
 * Scala UDF would leave the codegen path. The Deflater is pooled per
 * thread and reset per call — constructing one per row would dominate
 * the cost.
 *
 * Determinism: for a fixed JRE's zlib build, level, and strategy the
 * output bytes — hence the length — are a pure function of the input,
 * stable across partitions, layouts, and replays. The length is NOT
 * portable across zlib builds, so it is a SIGNAL column (thresholds,
 * ranking), not an exchange format; the `text_compress_ratio` contract
 * row is therefore SELF-VERIFYING — it hashes exact invariants (the
 * deflate-bound window, the repetitive-compresses-better covariance)
 * the oracle pins as literals, not the raw length.
 */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_len"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.eval(input.asInstanceOf[UTF8String])

  // MODULE$ call for the same Janino static-forwarder reason as
  // Md5Prefix28 (the companion's eval() name-clashes with Expression.eval)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLen$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  // raw deflate (nowrap) at the default level: no zlib header/checksum
  // bytes polluting tiny inputs; reset() re-arms the native stream far
  // cheaper than constructing one per row. The sink buffer pools with
  // it — the output BYTES are discarded (only the count is kept), so a
  // per-row 8 KB allocation would be pure GC pressure on the hot path.
  private val deflaters = ThreadLocal.withInitial(
    new java.util.function.Supplier[(java.util.zip.Deflater, Array[Byte])] {
      override def get(): (java.util.zip.Deflater, Array[Byte]) =
        (new java.util.zip.Deflater(6, true), new Array[Byte](8192))
    })

  def eval(s: UTF8String): Int = {
    val (d, buf) = deflaters.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    // Long accumulator: DEFLATE expands incompressible input ~5B/64KB
    // block, so a near-2GiB value could overflow an Int counter; clamp
    // (it is a SIGNAL, and at that magnitude the clamp is exact enough)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    math.min(total, Int.MaxValue.toLong).toInt
  }

  def apply(c: Column): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(c)))
}
