package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: the md5-prefix hashes of a document's
 * DISTINCT word n-gram shingles, straight from the text bytes — exactly
 *
 *   transform(TextFns.shingles(text, n), s => hashXX(s))
 *
 * (hash28 = first 7 md5 hex digits as a long, hash60 = first 15 — the
 * [[Dedup]] inverted-index keys) but with ZERO per-shingle string
 * allocation. The equivalence that makes this possible: `words` splits
 * on a SINGLE-space regex and shingles re-join with single spaces, so
 * every shingle "w_i … w_{i+n-1}" is byte-for-byte a CONTIGUOUS SLICE of
 * the original UTF-8 text (split-then-rejoin reconstructs the input
 * exactly, empties included). The composed form materializes each
 * shingle string (zip_with concat), distincts the string array, then
 * md5s a copy of each — O(text · n) allocation per document; this
 * expression scans the text's bytes once for word boundaries and feeds
 * `MessageDigest.update(bytes, from, len)` windows directly.
 *
 * This sits under the four heaviest non-training dedup queries (the
 * n-gram Jaccard/containment family — round-8 verdict's top item),
 * which is what justifies a custom expression over built-ins
 * (SURVEY §7.2). Parity contract, mirrored by Round9ShingleProperties
 * against the composed form and by the full DuckDB oracle run:
 *  - distinctness is true byte-equality of slices (first-occurrence
 *    order), NOT digest equality — two distinct shingles that collide
 *    at 28 bits still emit two (equal) hash entries, exactly like
 *    `array_distinct` on strings followed by per-element hashing;
 *  - fewer than n words (or null text) → EMPTY array, matching the
 *    composed `when(size(w) >= n, …).otherwise(array())` — so the
 *    expression is non-nullable and null-INtolerant is deliberately
 *    false.
 *
 * UTF-8 note: the space byte 0x20 never occurs inside a multi-byte
 * sequence, so byte scanning finds exactly the code points the regex
 * split finds.
 */
case class ShingleHash(child: Expression, n: Int, hexDigits: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  require(hexDigits == 7 || hexDigits == 15,
    s"hexDigits must be 7 (28-bit) or 15 (60-bit), got $hexDigits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "shingle_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  // null text → empty array (the composed form's otherwise-branch), so
  // bypass UnaryExpression's null-propagating eval entirely
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    ShingleHash.eval(v.asInstanceOf[UTF8String], n, hexDigits)
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.eval(input.asInstanceOf[UTF8String], n, hexDigits)

  // NOTE: MODULE$ call — scalac suppresses the static forwarder for the
  // companion's eval (name clash with Expression.eval), see Md5Prefix28
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val childVal = if (child.nullable) s"(${c.isNull} ? null : ${c.value})"
                   else c.value
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.ShingleHash$$.MODULE$$.eval($childVal, $n, $hexDigits);
        boolean ${ev.isNull} = false;""")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {
  private val EMPTY: ArrayData = new GenericArrayData(Array.emptyLongArray)

  private val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  /** A byte window of the text — the no-copy stand-in for a shingle
    * string in the distinctness set. Equality is exact byte equality
    * (== string equality: UTF-8 is injective), never digest equality. */
  private final class Slice(val b: Array[Byte], val from: Int, val to: Int) {
    override def hashCode: Int = {
      var h = 1; var i = from
      while (i < to) { h = h * 31 + b(i); i += 1 }
      h
    }
    override def equals(o: Any): Boolean = o match {
      case s: Slice =>
        val len = to - from
        if (s.to - s.from != len) return false
        var i = 0
        while (i < len) {
          if (b(from + i) != s.b(s.from + i)) return false
          i += 1
        }
        true
      case _ => false
    }
  }

  /** First `hexDigits` md5 hex digits as a long (7 → 28 bits, matching
    * [[Md5Prefix28]]; 15 → 60 bits, matching Dedup.hash60Sql). */
  private def prefix(d: Array[Byte], hexDigits: Int): Long =
    if (hexDigits == 7)
      ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >>> 4)
    else {
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      (v << 4) | ((d(7) & 0xf0L) >>> 4)
    }

  def eval(s: UTF8String, n: Int, hexDigits: Int): ArrayData = {
    if (s == null) return EMPTY
    val bytes = s.getBytes
    // word j occupies [starts(j), starts(j+1) - 1); the +1 virtual end
    // makes the last word uniform. numWords = spaces + 1 (split keeps
    // leading/trailing/adjacent empties — probed against Spark's split)
    var numWords = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') numWords += 1
      i += 1
    }
    if (numWords < n) return EMPTY
    val starts = new Array[Int](numWords + 1)
    var w = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(numWords) = bytes.length + 1
    val count = numWords - n + 1
    val out = new Array[Long](count)
    val seen = new java.util.HashSet[Slice](count * 2)
    val md = digests.get()
    var outN = 0
    var k = 0
    while (k < count) {
      // shingle k = words k..k+n-1 = text bytes [starts(k), starts(k+n)-1)
      val from = starts(k)
      val to = starts(k + n) - 1
      if (seen.add(new Slice(bytes, from, to))) {
        md.reset()
        md.update(bytes, from, to - from)
        out(outN) = prefix(md.digest(), hexDigits)
        outN += 1
      }
      k += 1
    }
    new GenericArrayData(
      if (outN == count) out else java.util.Arrays.copyOf(out, outN))
  }

  /** 28-bit variant: elementwise == `transform(shingles(t, n), hash28)`. */
  def h28(c: Column, n: Int = 3): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(c), n, 7))

  /** 60-bit variant: elementwise == `transform(shingles(t, n), hash60)`. */
  def h60(c: Column, n: Int = 3): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(c), n, 15))
}
