package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Subword

/** The subword tokenizer vs an INDEPENDENT plain-Scala reference model:
  * the model pre-tokenizes with java.util.regex (the expression walks
  * code points by hand) and greedy-matches by filtering the raw piece
  * list (the expression probes hashed length-bucketed sets), so shared
  * bugs would have to be shared across two implementations of both
  * stages. */
class SubwordSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // ---- reference model ----
  private val starts =
    Subword.defaultPieces.filterNot(_.startsWith("##")).toSet
  private val conts =
    Subword.defaultPieces.filter(_.startsWith("##")).map(_.drop(2)).toSet
  private val wordRe = java.util.regex.Pattern
    .compile("[a-z0-9]+|[^a-z0-9 \t\n\r\f]")

  private def refWord(w: String): Seq[String] = {
    if (w.codePointCount(0, w.length) > Subword.maxWordChars)
      return Seq(Subword.unk)
    val acc = scala.collection.mutable.Buffer[String]()
    var pos = 0
    while (pos < w.length) {
      val set = if (pos == 0) starts else conts
      val cands = set.filter(p =>
        p.length <= w.length - pos && w.startsWith(p, pos))
      if (cands.isEmpty) return Seq(Subword.unk)
      val best = cands.maxBy(_.length)
      acc += (if (pos == 0) best else "##" + best)
      pos += best.length
    }
    acc.toSeq
  }

  private def refTokenize(text: String): Seq[String] =
    if (text == null) Nil
    else {
      val m = wordRe.matcher(text)
      val out = scala.collection.mutable.Buffer[String]()
      while (m.find()) out ++= refWord(m.group())
      out.toSeq
    }

  private def viaExpr(texts: Seq[String]): Seq[Seq[String]] =
    texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t")
      .select(col("i"), Subword.tokens(col("t")).as("toks"))
      .orderBy("i").collect()
      .map(_.getSeq[String](1).toList.map(identity)).toSeq

  test("edge cases match the reference model") {
    val cases = Seq(
      null, "", " ", "   \t\n\r\f ",
      "the window table query stream",
      "windowing tables, queries!  ",
      "a", "z9", "...", "(un)known",
      "\u000B",                // vertical tab: NOT whitespace here
      "café résumé", // é → single-char UNK word splits
      "x" * 50, "x" * 51,           // the max_input_chars_per_word edge
      "😀gap😀", // non-BMP code points (one UNK each)
      "don't stop-me; it's 42.5% \"quoted\"",
      "key agg row scan slow fast table value part hash")
    val got = viaExpr(cases)
    cases.zip(got).foreach { case (t, g) =>
      assert(g == refTokenize(t), s"input: ${Option(t)}")
    }
    // pinned facts, so the model itself is anchored: greedy longest
    // match, continuation prefixes, whole-word UNK
    assert(refTokenize("windowing") == Seq("wind", "##ow", "##ing"))
    assert(refTokenize("table") == Seq("tab", "##le"))
    assert(refTokenize("café") == Seq("c", "##a", "##f", "[UNK]"))
    assert(refTokenize("x" * 51) == Seq("[UNK]"))
  }

  test("vocab as data: a table-loaded custom vocab drives the same " +
    "expression (50 random samples vs a custom-vocab model)") {
    // a tiny custom vocab: no 'e' single, so any word with 'e' outside
    // a multi-char piece is UNK — discriminates from the default vocab
    val custom = Seq("a", "b", "c", "d", "x", "ab", "abc", "##a",
      "##b", "##c", "##d", "##x", "##cd", "##bcd", ".")
    val loaded = Subword.piecesFrom(
      custom.toDF("piece"), pieceCol = "piece")
    assert(loaded.sorted == custom.sorted,
      "piecesFrom must round-trip the table")
    // a custom-vocab reference model (the refWord logic, custom sets)
    val cStarts = custom.filterNot(_.startsWith("##")).toSet
    val cConts = custom.filter(_.startsWith("##")).map(_.drop(2)).toSet
    def cWord(w: String): Seq[String] = {
      if (w.codePointCount(0, w.length) > Subword.maxWordChars)
        return Seq(Subword.unk)
      val acc = scala.collection.mutable.Buffer[String]()
      var pos = 0
      while (pos < w.length) {
        val set = if (pos == 0) cStarts else cConts
        val cands = set.filter(p =>
          p.length <= w.length - pos && w.startsWith(p, pos))
        if (cands.isEmpty) return Seq(Subword.unk)
        val best = cands.maxBy(_.length)
        acc += (if (pos == 0) best else "##" + best)
        pos += best.length
      }
      acc.toSeq
    }
    def cTokenize(text: String): Seq[String] = {
      val m = wordRe.matcher(text)
      val out = scala.collection.mutable.Buffer[String]()
      while (m.find()) out ++= cWord(m.group())
      out.toSeq
    }
    val g = for {
      n <- Gen.choose(0, 40)
      cs <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.oneOf('a', 'b', 'c', 'd', 'x', 'e'),
        2 -> Gen.const(' '), 1 -> Gen.const('.')))
    } yield cs.mkString
    val texts = PropertySamples.samples(g, 50, seedBase = 1501L)
    val got = texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t")
      .select(col("i"), Subword.tokens(col("t"), loaded).as("toks"))
      .orderBy("i").collect()
      .map(_.getSeq[String](1).toList.map(identity)).toSeq
    texts.zip(got).foreach { case (t, g2) =>
      assert(g2 == cTokenize(t), s"input: '$t'")
    }
    // and the custom vocab genuinely differs from the default
    assert(cTokenize("abcd") != refTokenize("abcd") ||
      cTokenize("the") != refTokenize("the"))
  }

  test("random texts match the reference model (200 samples)") {
    val alphabet = Gen.frequency(
      8 -> Gen.alphaLowerChar,
      2 -> Gen.numChar,
      2 -> Gen.const(' '),
      1 -> Gen.oneOf('\t', '\n', '\r', '\f', '\u000B'),
      1 -> Gen.oneOf('.', ',', '!', '?', ';', ':', '\'', '"', '-', '(',
        ')', '@', '#', '$', '%', '^', '&', '*', '_', '+', '='),
      1 -> Gen.oneOf('é', '中', '文', 'A', 'Z'))
    val g = for {
      n <- Gen.choose(0, 120)
      cs <- Gen.listOfN(n, alphabet)
    } yield cs.mkString
    val texts = PropertySamples.samples(g, 200, seedBase = 1300L)
    val got = viaExpr(texts)
    texts.zip(got).foreach { case (t, g2) =>
      assert(g2 == refTokenize(t), s"input: '$t'")
    }
  }

  test("tokenCount is the token array's size as a long") {
    val df = Seq("the window", "", "zzz").toDF("t")
      .select(Subword.tokenCount(col("t")).as("n"),
        size(Subword.tokens(col("t"))).cast("long").as("m"))
    assert(df.collect().forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("SQL surface: subword_tokenize matches the library Column") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT subword_tokenize('the window, 42!') AS toks")
      .head().getSeq[String](0).toList
    assert(got == refTokenize("the window, 42!"))
  }
}
