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
 * Deterministic vocab-driven subword tokenization (WordPiece-style
 * greedy longest-match) — tokenizer-accurate token accounting for the
 * packing/budget/chunking operators, which previously counted
 * whitespace tokens only (round-12 verdict task 1: whitespace and
 * subword counts diverge 2–5× on code/CJK/URL-heavy text, and training
 * pipelines budget in subword tokens).
 *
 * The FULL rule, stated once (the DuckDB oracle and the plain-Scala
 * property model mirror it expression-for-expression):
 *
 *  1. Pre-tokenize the (already lowercased) text into words: maximal
 *     runs of `[a-z0-9]`, and every other non-whitespace code point as
 *     its own single-char word; whitespace is exactly
 *     `space \t \n \r \f` (an EXPLICIT class — Java's and RE2's `\s`
 *     disagree on \x0B, so neither engine's shorthand is used).
 *  2. Per word: greedy longest-match against the vocab — at offset 0
 *     only non-continuation pieces match, afterwards only continuation
 *     (`##`-prefixed) pieces; the longest matching piece is consumed
 *     and emitted (continuations emit WITH their `##` prefix). If no
 *     piece matches at any offset, the WHOLE word becomes one `[UNK]`
 *     (WordPiece semantics, not a partial emission). Words longer than
 *     [[Subword.maxWordChars]] code points are `[UNK]` outright
 *     (BERT's max_input_chars_per_word device, bounding the scan).
 *  3. Null text → empty token array (matching the composed
 *     `when(isnull, array())` form, so the expression is non-nullable).
 *
 * Greedy matching needs a loop with data-dependent trip count, which no
 * fixed-depth Column composition expresses; Spark's higher-order
 * functions could fold it but are CodegenFallback. A native expression
 * (the [[ShingleHash]] precedent) keeps the row inside generated code
 * and makes the match O(maxPieceLen) hash probes per consumed piece.
 *
 * The default vocab ([[Subword.defaultPieces]]) is a FIXTURE: single
 * ASCII letters/digits in both start and continuation form (so plain
 * ASCII words always tokenize, exercising multi-piece splits), a set of
 * English prefix/suffix pieces, and common punctuation. It is the
 * single source of truth — [[Subword.vocabValuesSql]] renders the same
 * list for the DuckDB oracle.
 */
case class SubwordTokenize(child: Expression, pieces: Seq[String])
    extends UnaryExpression {
  require(pieces.nonEmpty, "subword vocab must be non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "subword_tokenize"

  @transient private lazy val compiled = Subword.compile(pieces)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  // null text → empty array, so bypass UnaryExpression's
  // null-propagating eval entirely (the ShingleHash device)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    Subword.eval(v.asInstanceOf[UTF8String], compiled)
  }

  override protected def nullSafeEval(input: Any): Any =
    Subword.eval(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val vocab = ctx.addReferenceObj("subwordVocab", compiled,
      classOf[Subword.Compiled].getName)
    val c = child.genCode(ctx)
    val childVal = if (child.nullable) s"(${c.isNull} ? null : ${c.value})"
                   else c.value
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.Subword$$.MODULE$$.eval($childVal, $vocab);
        boolean ${ev.isNull} = false;""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SubwordTokenize = copy(child = newChild)
}

object Subword {
  /** WordPiece's max_input_chars_per_word: longer words are [UNK]
    * outright (in CODE POINTS, matching DuckDB's len()). */
  val maxWordChars = 50

  val unk = "[UNK]"

  /** The fixture vocab — single source of truth for the expression, the
    * DuckDB oracle ([[vocabValuesSql]]) and the property model. All
    * pieces are ASCII and lowercase; `##` marks continuation pieces. */
  val defaultPieces: Seq[String] = {
    val singles = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    val multiStart = Seq("the", "th", "wh", "ch", "qu", "st", "str",
      "re", "un", "in", "on", "an", "pro", "con", "com", "dis", "over",
      "out", "data", "wind", "tab", "val", "mer", "bat", "spark",
      "quer", "fil", "vec", "sort", "line", "scan", "hash", "key",
      "row", "big", "fast", "slow", "join", "agg")
    val multiCont = Seq("ing", "ed", "er", "es", "s", "ly", "tion",
      "al", "ment", "ness", "able", "ent", "ive", "ate", "ow", "ble",
      "ery", "eam", "ta", "ue", "dow", "ter", "ge", "ck", "nd", "rt",
      "le", "ne", "all", "mall").map("##" + _)
    val punct = Seq(".", ",", "!", "?", ";", ":", "'", "\"", "-",
      "(", ")")
    singles ++ singles.map("##" + _) ++ multiStart ++ multiCont ++ punct
  }

  /** The vocab as a SQL VALUES body — `('a'), ('##a'), …` — for the
    * DuckDB oracle's `vocab(piece)` CTE. Apostrophes doubled. */
  def vocabValuesSql(pieces: Seq[String] = defaultPieces): String =
    pieces.map(p => s"('${p.replace("'", "''")}')").mkString(", ")

  /** Load a vocab from DATA — the real-tokenizer-artifact path
    * (round-15: the fixture default exists for the oracle; a production
    * run reads its actual WordPiece vocab.txt, landed as a table with
    * one `##`-marked piece per row, and drives the SAME expression —
    * packing/budget/chunking then count in that tokenizer's currency).
    * A vocab is METADATA-scale (~30k pieces for BERT-family vocabs):
    * it collects once on the driver and ships inside the expression
    * (the task binary broadcasts once per executor). Bounded loudly so
    * a corpus column can't silently be mistaken for a vocab. */
  def piecesFrom(vocab: org.apache.spark.sql.DataFrame,
                 pieceCol: String = "piece",
                 maxPieces: Int = 1 << 20): Seq[String] = {
    val rows = vocab.select(col(pieceCol).cast("string"))
      .limit(maxPieces + 1).collect()
    require(rows.length <= maxPieces,
      s"vocab table exceeds $maxPieces pieces — not a vocab table?")
    val ps = rows.map(_.getString(0)).toIndexedSeq
    require(ps.forall(p => p != null && p.nonEmpty &&
      p != "##"), "vocab pieces must be non-null, non-empty strings")
    ps
  }

  /** Subword tokens of an already-LOWERCASED string column. Callers
    * pass `lower(text)` so case folding stays in the engine's own SQL
    * semantics (the oracle lowercases with DuckDB's lower()). */
  def tokens(lowered: Column,
             pieces: Seq[String] = defaultPieces): Column =
    ColumnBridge.column(SubwordTokenize(
      ColumnBridge.expression(lowered), pieces))

  /** Subword token COUNT — the packing/budget/chunking currency. */
  def tokenCount(lowered: Column,
                 pieces: Seq[String] = defaultPieces): Column =
    size(tokens(lowered, pieces)).cast("long")

  /** Start/continuation piece sets hashed for O(1) longest-match
    * probes, plus the max piece length bounding the probe window. */
  final class Compiled(pieces: Seq[String]) extends Serializable {
    val starts = new java.util.HashSet[String]()
    val conts = new java.util.HashSet[String]()
    var maxLen = 1
    pieces.foreach { p =>
      val (set, raw) =
        if (p.startsWith("##")) (conts, p.substring(2)) else (starts, p)
      require(raw.nonEmpty, s"empty vocab piece: '$p'")
      set.add(raw)
      if (raw.length > maxLen) maxLen = raw.length
    }
  }

  private val compileCache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], Compiled]()

  def compile(pieces: Seq[String]): Compiled =
    compileCache.computeIfAbsent(pieces, p => new Compiled(p))

  private val EMPTY: ArrayData =
    new GenericArrayData(Array.empty[Any])

  private val UNK_U = UTF8String.fromString(unk)

  def eval(text: UTF8String, vocab: Compiled): ArrayData = {
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
        wordPiece(s, i, j, vocab, out)
        i = j
      } else {
        wordPiece(s, i, i + n, vocab, out)
        i += n
      }
    }
    new GenericArrayData(out.toArray)
  }

  // whitespace is the EXPLICIT class (space \t \n \r \f) — see scaladoc
  private def isSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == '\f'

  private def isAlnum(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')

  /** Greedy longest-match over word = s[from, to). Either appends the
    * full piece sequence or exactly one [UNK] — never a partial word. */
  private def wordPiece(s: String, from: Int, to: Int, vocab: Compiled,
                        out: scala.collection.mutable.ArrayBuffer[Any])
      : Unit = {
    if (s.codePointCount(from, to) > maxWordChars) {
      out += UNK_U
      return
    }
    val mark = out.length
    var pos = from
    while (pos < to) {
      val set = if (pos == from) vocab.starts else vocab.conts
      var l = math.min(vocab.maxLen, to - pos)
      var found = -1
      while (l >= 1 && found < 0) {
        if (set.contains(s.substring(pos, pos + l))) found = l
        l -= 1
      }
      if (found < 0) {
        out.remove(mark, out.length - mark)
        out += UNK_U
        return
      }
      out += UTF8String.fromString(
        if (pos == from) s.substring(pos, pos + found)
        else "##" + s.substring(pos, pos + found))
      pos += found
    }
  }
}
