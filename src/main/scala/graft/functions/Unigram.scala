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
 * Unigram-LM tokenization (the SentencePiece family) — the third
 * tokenizer beside WordPiece greedy longest-match ([[Subword]]) and
 * merge-rank BPE ([[Bpe]]): each word segments into the piece sequence
 * of MINIMUM total cost (≡ maximum log-probability) via Viterbi DP, so
 * a locally-longest piece loses when a cheaper decomposition exists —
 * "window" splits win+dow here even though the vocab contains "wind"
 * (greedy's choice), because the total cost is lower.
 *
 * Costs are INTEGERS (scaled −log p): real unigram models carry float
 * log-probs, but the segmentation depends only on their ORDER
 * STRUCTURE, and integer costs make every DP comparison engine-exact —
 * the DuckDB oracle replays the same DP over the DISTINCT word set
 * (incremental best-cost lists in a recursive CTE) with zero
 * float-association hazard. The FULL rule:
 *
 *  1. Pre-tokenize the (already lowercased) text into words exactly
 *     like [[Subword]]/[[Bpe]]: maximal `[a-z0-9]` runs, every other
 *     non-whitespace code point its own word; whitespace is the same
 *     EXPLICIT class (space \t \n \r \f).
 *  2. Per word: Viterbi over positions — dp(0) = 0; dp(j) = min over
 *     i < j of dp(i) + cost(word[i, j)), where cost is the vocab table
 *     for known pieces, and [[Unigram.unkCost]] for any SINGLE code
 *     point not in the table (so segmentation never fails — the
 *     SentencePiece character-coverage convention). Ties break to the
 *     SMALLEST i (the longest final piece) — the scan keeps the first
 *     strictly-better candidate, and the oracle sorts (cost, i).
 *  3. Words longer than [[Unigram.maxWordChars]] code points skip the
 *     DP: each code point its own token (the [[Bpe]] bound).
 *  4. Null text → empty token array (non-nullable expression).
 *
 * The DP's inner scan is data-dependent per word, so this is a native
 * expression (the [[Subword]]/[[Bpe]]/[[ShingleHash]] device) keeping
 * rows inside generated code. [[Unigram.defaultPieces]] is a fixture
 * over the synthetic corpus vocabulary, deliberately carrying
 * greedy-vs-Viterbi traps; [[Unigram.piecesCostSql]] renders the same
 * table for the oracle — single source of truth.
 */
case class UnigramTokenize(child: Expression, pieces: Seq[(String, Int)])
    extends UnaryExpression {
  require(pieces.nonEmpty, "unigram piece table must be non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "unigram_tokenize"

  @transient private lazy val compiled = Unigram.compile(pieces)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    Unigram.eval(v.asInstanceOf[UTF8String], compiled)
  }

  override protected def nullSafeEval(input: Any): Any =
    Unigram.eval(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val table = ctx.addReferenceObj("unigramPieces", compiled,
      classOf[Unigram.Compiled].getName)
    val c = child.genCode(ctx)
    val childVal = if (child.nullable) s"(${c.isNull} ? null : ${c.value})"
                   else c.value
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.Unigram$$.MODULE$$.eval($childVal, $table);
        boolean ${ev.isNull} = false;""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramTokenize = copy(child = newChild)
}

object Unigram {
  /** The [[Subword.maxWordChars]] bound, applied to the DP. */
  val maxWordChars = 50

  /** Cost of a single code point absent from the piece table — high
    * enough that any in-table decomposition beats it, never infinite
    * (segmentation must not fail on novel characters). */
  val unkCost = 1000

  /** The fixture piece table (piece → integer cost). Singles cover
    * [a-z0-9] and core punctuation at 100; multi-char pieces are priced
    * so Viterbi has real decisions, including greedy traps ("wind" is
    * IN the table yet "window" = win+dow wins on total cost; "query"
    * beats qu+er+y; "table" undercuts tab+le by 10). */
  val defaultPieces: Seq[(String, Int)] = {
    val singles = ((('a' to 'z') ++ ('0' to '9')).map(_.toString) ++
      Seq(".", ",", "!", "?", ";", ":", "'", "\"", "-", "(", ")"))
      .map(_ -> 100)
    val multi = Seq(
      "the" -> 110, "th" -> 150, "in" -> 90, "er" -> 110, "ed" -> 110,
      "ing" -> 115, "data" -> 120, "at" -> 140, "ta" -> 150, "da" -> 150,
      "win" -> 130, "dow" -> 130, "wind" -> 140, "ow" -> 150,
      "qu" -> 120, "query" -> 150, "quer" -> 160,
      "stream" -> 150, "st" -> 130, "re" -> 120,
      "join" -> 140, "jo" -> 150,
      "tab" -> 135, "le" -> 115, "table" -> 240,
      "all" -> 120, "sm" -> 140, "or" -> 110, "der" -> 130,
      "row" -> 125, "scan" -> 140, "sort" -> 140, "hash" -> 135,
      "key" -> 125, "big" -> 130, "fast" -> 140, "slow" -> 140,
      "spark" -> 150, "val" -> 130, "ue" -> 130, "mer" -> 130,
      "ge" -> 120, "bat" -> 130, "ch" -> 115, "cus" -> 140,
      "tom" -> 140, "gr" -> 130, "ou" -> 130, "dup" -> 150,
      "fil" -> 130, "ter" -> 120, "line" -> 130, "part" -> 135,
      "vec" -> 130, "tor" -> 130, "col" -> 130, "umn" -> 160,
      "group" -> 220)
    singles ++ multi
  }

  /** Render the cost lookup for piece expression `e` in DuckDB SQL:
    * the table as a CASE chain, then the single-code-point [[unkCost]]
    * fallback, NULL for unknown multi-char pieces (= not a piece). */
  def piecesCostSql(e: String,
                    pieces: Seq[(String, Int)] = defaultPieces): String = {
    val cases = pieces.map { case (p, c) =>
      s"WHEN '${p.replace("'", "''")}' THEN $c"
    }.mkString(" ")
    s"coalesce(CASE $e $cases END, " +
      s"CASE WHEN length($e) = 1 THEN $unkCost END)"
  }

  /** Load a unigram vocab from DATA — a real SentencePiece-style
    * artifact landed as a table (piece, cost) drives the same Viterbi
    * expression the fixture default does (the [[Subword.piecesFrom]]
    * device). Costs are the INTEGER order-preserving form (float
    * log-probs matter only through their order — quantize before
    * landing the table). Metadata-scale; collected once on the driver,
    * bounded loudly. */
  def piecesFrom(vocab: org.apache.spark.sql.DataFrame,
                 pieceCol: String = "piece", costCol: String = "cost",
                 maxPieces: Int = 1 << 20): Seq[(String, Int)] = {
    val rows = vocab.select(col(pieceCol).cast("string"),
        col(costCol).cast("int"))
      .limit(maxPieces + 1).collect()
    require(rows.length <= maxPieces,
      s"vocab table exceeds $maxPieces pieces — not a vocab table?")
    rows.map { r =>
      require(!r.isNullAt(0) && r.getString(0).nonEmpty && !r.isNullAt(1),
        "unigram pieces must be non-null, non-empty, with a cost")
      (r.getString(0), r.getInt(1))
    }.toIndexedSeq
  }

  /** Unigram tokens of an already-LOWERCASED string column. */
  def tokens(lowered: Column,
             pieces: Seq[(String, Int)] = defaultPieces): Column =
    ColumnBridge.column(UnigramTokenize(
      ColumnBridge.expression(lowered), pieces))

  /** Unigram token COUNT — the budget currency for SentencePiece
    * stacks. */
  def tokenCount(lowered: Column,
                 pieces: Seq[(String, Int)] = defaultPieces): Column =
    size(tokens(lowered, pieces)).cast("long")

  final class Compiled(pieces: Seq[(String, Int)]) extends Serializable {
    val cost = new java.util.HashMap[String, Integer]()
    var maxPieceLen = 1
    pieces.foreach { case (p, c) =>
      require(p.nonEmpty, "empty piece")
      require(c >= 0, s"negative cost for '$p'")
      val prev = cost.putIfAbsent(p, c)
      require(prev == null, s"duplicate piece '$p'")
      val cps = p.codePointCount(0, p.length)
      if (cps > maxPieceLen) maxPieceLen = cps
    }
  }

  private val compileCache =
    new java.util.concurrent.ConcurrentHashMap[Seq[(String, Int)], Compiled]()

  def compile(pieces: Seq[(String, Int)]): Compiled =
    compileCache.computeIfAbsent(pieces, p => new Compiled(p))

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
        viterbiWord(s, i, j, table, out)
        i = j
      } else {
        viterbiWord(s, i, i + n, table, out)
        i += n
      }
    }
    new GenericArrayData(out.toArray)
  }

  private def isSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == '\f'

  private def isAlnum(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')

  /** Viterbi DP over word = s[from, to), in CODE POINTS. */
  private def viterbiWord(s: String, from: Int, to: Int, table: Compiled,
                          out: scala.collection.mutable.ArrayBuffer[Any])
      : Unit = {
    // code-point boundaries (alnum runs are ASCII, other words are one
    // code point — but keep the general walk so a supplementary-plane
    // character still counts as ONE position)
    val bounds = new scala.collection.mutable.ArrayBuffer[Int]()
    var p = from
    while (p < to) { bounds += p; p += Character.charCount(s.codePointAt(p)) }
    bounds += to
    val len = bounds.length - 1
    if (len > maxWordChars) {
      var k = 0
      while (k < len) {
        out += UTF8String.fromString(s.substring(bounds(k), bounds(k + 1)))
        k += 1
      }
      return
    }
    val dp = Array.fill(len + 1)(Int.MaxValue)
    val back = Array.fill(len + 1)(-1)
    dp(0) = 0
    var j = 1
    while (j <= len) {
      var i = math.max(0, j - table.maxPieceLen)
      while (i < j) {
        if (dp(i) != Int.MaxValue) {
          val piece = s.substring(bounds(i), bounds(j))
          var c = table.cost.get(piece)
          if (c == null && j - i == 1) c = Integer.valueOf(unkCost)
          // strict < : on ties the SMALLEST i (scanned first) wins
          if (c != null && dp(i) + c < dp(j)) {
            dp(j) = dp(i) + c
            back(j) = i
          }
        }
        i += 1
      }
      j += 1
    }
    // dp(len) is always reachable (single-cp fallback), backtrack
    val rev = new scala.collection.mutable.ArrayBuffer[String]()
    var cur = len
    while (cur > 0) {
      val i = back(cur)
      rev += s.substring(bounds(i), bounds(cur))
      cur = i
    }
    var k = rev.length - 1
    while (k >= 0) { out += UTF8String.fromString(rev(k)); k -= 1 }
  }
}
