package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Merge-rank BPE tokenization (round-13 verdict task 6): GPT-family
 * pipelines budget in byte-level BPE with RANKED merges, whose token
 * counts diverge from WordPiece's greedy longest-match ([[Subword]]) —
 * greedy always takes the longest piece at each offset, while BPE
 * applies the globally lowest-ranked merge first, so an early cheap
 * merge can consume a character a later merge needed. Both tokenizers
 * now exist side by side; pick the one matching the training stack.
 *
 * The FULL rule, stated once (the DuckDB oracle replays it as a
 * recursive replace chain over the DISTINCT word set — task 2's
 * oracle-budget lesson applied up front — and the property model
 * re-implements it independently):
 *
 *  1. Pre-tokenize the (already lowercased) text into words exactly
 *     like [[Subword]]: maximal `[a-z0-9]` runs, every other
 *     non-whitespace code point its own word; whitespace is the same
 *     EXPLICIT class (space \t \n \r \f).
 *  2. Per word: start from the sequence of single code points.
 *     Repeat: among all ADJACENT segment pairs present in the merge
 *     table, find the one with the LOWEST rank; merge every
 *     left-to-right non-overlapping occurrence of that pair; stop when
 *     no adjacent pair is ranked. (Ranks are unique — the table is a
 *     list, rank = position.)
 *  3. There is no [UNK]: byte-level BPE's base vocabulary is every
 *     code point, so an unmergeable character is simply its own token.
 *  4. Words longer than [[Bpe.maxWordChars]] code points skip merging
 *     entirely (each code point its own token) — the [[Subword]]
 *     bound, here capping the O(len · merges) loop, not recall.
 *  5. Null text → empty token array (non-nullable expression).
 *
 * The merge loop's trip count is data-dependent (each pass depends on
 * the previous pass's segmentation), which no fixed-depth Column tree
 * expresses — a native expression (the [[Subword]]/[[ShingleHash]]
 * device) keeps rows inside generated code.
 *
 * The default merge table ([[Bpe.defaultMerges]]) is a FIXTURE built
 * against the synthetic corpus vocabulary, deliberately including
 * order-dependence traps: (a,t) outranks (t,a) so "data" becomes
 * [d,at,a] not [d,ta,ta-less]; (h,a)+(ha,s) beat the late (a,s) in
 * "hash"; (j,o)+(i,n)+(jo,in) chain "join" to one token. It is the
 * single source of truth — [[Bpe.mergesValuesSql]] renders the same
 * list for the DuckDB oracle.
 */
case class BpeTokenize(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  require(merges.nonEmpty, "BPE merge table must be non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bpe_tokenize"

  @transient private lazy val compiled = Bpe.compile(merges)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  // null text → empty array, bypassing null propagation (the Subword
  // device)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    Bpe.eval(v.asInstanceOf[UTF8String], compiled)
  }

  override protected def nullSafeEval(input: Any): Any =
    Bpe.eval(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val table = ctx.addReferenceObj("bpeMerges", compiled,
      classOf[Bpe.Compiled].getName)
    val c = child.genCode(ctx)
    val childVal = if (child.nullable) s"(${c.isNull} ? null : ${c.value})"
                   else c.value
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.Bpe$$.MODULE$$.eval($childVal, $table);
        boolean ${ev.isNull} = false;""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokenize = copy(child = newChild)
}

object Bpe {
  /** The [[Subword.maxWordChars]] bound, applied to the merge loop. */
  val maxWordChars = 50

  /** The fixture merge table, in RANK order (index = rank). Built
    * against the synthetic corpus vocabulary with deliberate
    * order-dependence: see the class scaladoc. */
  val defaultMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("a", "t"), ("a", "n"), ("i", "n"),
    ("o", "w"), ("e", "r"), ("in", "d"), ("s", "t"), ("h", "a"),
    ("ha", "s"), ("q", "u"), ("e", "y"), ("r", "y"), ("l", "l"),
    ("t", "a"), ("o", "r"), ("j", "o"), ("jo", "in"), ("s", "c"),
    ("a", "s"), ("g", "g"), ("u", "e"), ("p", "a"), ("r", "t"),
    ("e", "a"), ("m", "e"), ("u", "p"), ("b", "i"), ("d", "o"))

  /** The merge table as a SQL VALUES body — `('t','h',0), …` — for the
    * DuckDB oracle's `merges(a, b, rank)` CTE. */
  def mergesValuesSql(merges: Seq[(String, String)] = defaultMerges): String =
    merges.zipWithIndex.map { case ((a, b), r) =>
      s"('${a.replace("'", "''")}','${b.replace("'", "''")}',$r)"
    }.mkString(", ")

  /** Load a merge table from DATA — a real BPE artifact's merges.txt
    * landed as a table (left, right, rank) drives the same expression
    * the fixture default does (the [[Subword.piecesFrom]] device).
    * MERGE ORDER IS THE ALGORITHM: rows sort by `rankCol` before the
    * rank index is assigned, so the table's storage order never leaks
    * into tokenization. Metadata-scale (GPT-2 ships 50k merges);
    * collected once on the driver, bounded loudly. */
  def mergesFrom(merges: org.apache.spark.sql.DataFrame,
                 leftCol: String = "left", rightCol: String = "right",
                 rankCol: String = "rank",
                 maxMerges: Int = 1 << 20): Seq[(String, String)] = {
    // rank VALIDATION before the ordering (round-15 advice): a null (or
    // non-numeric — try_cast nulls it; ANSI's plain cast would throw an
    // opaque error mid-collect) rank sorts FIRST under Spark's
    // ascending null ordering and would silently head the merge order,
    // and duplicate ranks make the loaded order nondeterministic across
    // runs — and merge order IS the algorithm. Mirror of the non-null
    // segment checks below; one bounded aggregate over the table.
    val rk = expr(s"try_cast(`$rankCol` AS LONG)")
    val vr = merges.agg(count(lit(1)), count(rk), countDistinct(rk))
      .collect()(0)
    val (total, nonNull, distinct) =
      (vr.getLong(0), vr.getLong(1), vr.getLong(2))
    require(nonNull == total,
      s"merge ranks: ${total - nonNull} null/non-numeric values in " +
        s"'$rankCol' - null ranks sort first and would silently head " +
        "the merge order")
    require(distinct == total,
      s"merge ranks: ${total - distinct} duplicates in '$rankCol' - " +
        "duplicate ranks make the merge order nondeterministic")
    val rows = merges.select(col(leftCol).cast("string"),
        col(rightCol).cast("string"), col(rankCol).cast("long"))
      .orderBy(col(rankCol))
      .limit(maxMerges + 1).collect()
    require(rows.length <= maxMerges,
      s"merge table exceeds $maxMerges rows — not a merge table?")
    rows.map { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1) &&
        r.getString(0).nonEmpty && r.getString(1).nonEmpty,
        "merge segments must be non-null, non-empty strings")
      (r.getString(0), r.getString(1))
    }.toIndexedSeq
  }

  /** BPE tokens of an already-LOWERCASED string column (the [[Subword
    * .tokens]] convention: case folding stays in engine SQL). */
  def tokens(lowered: Column,
             merges: Seq[(String, String)] = defaultMerges): Column =
    ColumnBridge.column(BpeTokenize(
      ColumnBridge.expression(lowered), merges))

  /** BPE token COUNT — the budget currency for GPT-family stacks. */
  def tokenCount(lowered: Column,
                 merges: Seq[(String, String)] = defaultMerges): Column =
    size(tokens(lowered, merges)).cast("long")

  /** Pair → rank lookup. The key packs both segments with a SPACE
    * separator — segments come from whitespace-split words and from
    * merge-table outputs, neither of which can contain one. */
  final class Compiled(merges: Seq[(String, String)]) extends Serializable {
    val rank = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      require(a.nonEmpty && b.nonEmpty, s"empty merge side: ('$a','$b')")
      val prev = rank.putIfAbsent(a + " " + b, r)
      require(prev == null, s"duplicate merge pair ('$a','$b')")
    }
  }

  private val compileCache =
    new java.util.concurrent.ConcurrentHashMap[Seq[(String, String)], Compiled]()

  def compile(merges: Seq[(String, String)]): Compiled =
    compileCache.computeIfAbsent(merges, m => new Compiled(m))

  private val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  def eval(text: UTF8String, table: Compiled): ArrayData = {
    if (text == null) return EMPTY
    val s = text.toString
    if (s.isEmpty) return EMPTY
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      if (isSpace(cp)) i += n
      else if (isAlnum(cp)) {
        var j = i + 1
        while (j < s.length && {
          val c = s.charAt(j); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) j += 1
        bpeWord(s, i, j, table, out)
        i = j
      } else {
        bpeWord(s, i, i + n, table, out)
        i += n
      }
    }
    new GenericArrayData(out.toArray)
  }

  private def isSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == '\f'

  private def isAlnum(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')

  /** The ranked merge loop over word = s[from, to). */
  private def bpeWord(s: String, from: Int, to: Int, table: Compiled,
                      out: scala.collection.mutable.ArrayBuffer[Any])
      : Unit = {
    // split to code points
    var segs = new scala.collection.mutable.ArrayBuffer[String]()
    var p = from
    while (p < to) {
      val n = Character.charCount(s.codePointAt(p))
      segs += s.substring(p, p + n)
      p += n
    }
    if (segs.length <= maxWordChars) {
      var merging = segs.length > 1
      while (merging) {
        // the lowest-ranked adjacent pair present anywhere in the word
        var best = Int.MaxValue
        var i = 0
        while (i < segs.length - 1) {
          val r = table.rank.get(segs(i) + " " + segs(i + 1))
          if (r != null && r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) merging = false
        else {
          // merge every left-to-right non-overlapping occurrence
          val next = new scala.collection.mutable.ArrayBuffer[String](segs.length)
          var j = 0
          while (j < segs.length) {
            if (j < segs.length - 1 && {
              val r = table.rank.get(segs(j) + " " + segs(j + 1))
              r != null && r.intValue() == best
            }) {
              next += segs(j) + segs(j + 1)
              j += 2
            } else {
              next += segs(j)
              j += 1
            }
          }
          segs = next
          merging = segs.length > 1
        }
      }
    }
    segs.foreach(t => out += UTF8String.fromString(t))
  }
}
