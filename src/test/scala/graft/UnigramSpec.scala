package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Unigram

/** The unigram (Viterbi) tokenizer vs an INDEPENDENT model: the model
  * enumerates EVERY segmentation of a word and picks the cheapest
  * (exponential, fine at test lengths), while the expression runs the
  * DP — different algorithms that must agree wherever the minimum is
  * unique, plus pinned tie/edge rules. */
class UnigramSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val costOf: Map[String, Int] = Unigram.defaultPieces.toMap

  /** All segmentations of `w` with their costs (None = impossible). */
  private def segmentations(w: String): Seq[(Seq[String], Long)] = {
    if (w.isEmpty) return Seq((Nil, 0L))
    (1 to w.length).flatMap { k =>
      val piece = w.take(k)
      val c: Option[Int] = costOf.get(piece)
        .orElse(if (k == 1) Some(Unigram.unkCost) else None)
      c.toSeq.flatMap { pc =>
        segmentations(w.drop(k)).map { case (rest, rc) =>
          (piece +: rest, pc + rc)
        }
      }
    }
  }

  private def tokenize(s: String): Seq[String] =
    Seq(Tuple1(s)).toDF("t")
      .select(Unigram.tokens(col("t")).as("toks"))
      .collect().head.getSeq[String](0)

  test("greedy traps resolve to the cheapest segmentation, not the longest piece") {
    assert(tokenize("window") == Seq("win", "dow")) // "wind" is in the table
    assert(tokenize("query") == Seq("query"))       // beats qu+er+y
    assert(tokenize("table") == Seq("table"))       // undercuts tab+le by 10
    assert(tokenize("data") == Seq("data"))
    assert(tokenize("smallest") == Seq("sm", "all", "e", "st"))
    assert(tokenize("the window data") ==
      Seq("the", "win", "dow", "data"))
  }

  test("expression equals exhaustive enumeration wherever the minimum is unique") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdehijlmnoqrstuwy01"
    var checked = 0
    for (_ <- 0 until 300) {
      val w = (0 until (1 + rnd.nextInt(9)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val segs = segmentations(w)
      val minCost = segs.map(_._2).min
      val best = segs.filter(_._2 == minCost)
      if (best.length == 1) { // unique minimum: any correct DP must agree
        assert(tokenize(w) == best.head._1, s"word '$w'")
        checked += 1
      }
    }
    assert(checked > 200, s"only $checked unique-minimum words — weak test")
  }

  test("ties break to the longest final piece (the smallest DP start)") {
    val pieces = Seq("ab" -> 200, "a" -> 100, "b" -> 100)
    val toks = Seq(Tuple1("ab")).toDF("t")
      .select(Unigram.tokens(col("t"), pieces).as("toks"))
      .collect().head.getSeq[String](0)
    assert(toks == Seq("ab")) // cost ties a+b at 200; i=0 scanned first
  }

  test("unknown code points segment as single unk-cost tokens") {
    assert(tokenize("é") == Seq("é"))
    assert(tokenize("a.b") == Seq("a", ".", "b")) // '.' its own word, in table
    assert(tokenize("déjà") == Seq("d", "é", "j", "à"))
  }

  test("words beyond maxWordChars skip the DP: one token per code point") {
    val long = "ab" * 30 // 60 chars
    val toks = tokenize(long)
    assert(toks.length == 60)
    assert(toks.forall(t => t == "a" || t == "b"))
  }

  test("vocab as data: a table-loaded cost table drives the expression; " +
    "re-costing flips the greedy-trap decision") {
    // defaults landed as a table round-trip to identical tokenization
    val loaded = Unigram.piecesFrom(
      Unigram.defaultPieces.toDF("piece", "cost"))
    assert(loaded.toMap == Unigram.defaultPieces.toMap)
    val viaLoaded = Seq(Tuple1("window query table")).toDF("t")
      .select(Unigram.tokens(col("t"), loaded).as("toks"))
      .collect().head.getSeq[String](0)
    assert(viaLoaded == tokenize("window query table"))
    // a RE-COSTED table is a different tokenizer: make "wind" + "ow"
    // undercut "win" + "dow" and the trap decision flips
    val recosted = Unigram.piecesFrom(
      Unigram.defaultPieces.map { case (p, c) =>
        if (p == "wind") (p, 50) else (p, c)
      }.toDF("piece", "cost"))
    val flipped = Seq(Tuple1("window")).toDF("t")
      .select(Unigram.tokens(col("t"), recosted).as("toks"))
      .collect().head.getSeq[String](0)
    assert(flipped == Seq("wind", "ow"),
      s"re-costed vocab must flip the segmentation, got $flipped")
    assert(tokenize("window") == Seq("win", "dow"))
  }

  test("null and empty text tokenize to the empty array") {
    val rows = Seq(Some(""), None, Some("   ")).toDF("t")
      .select(Unigram.tokens(col("t")).as("toks"))
      .collect()
    assert(rows.forall(_.getSeq[String](0).isEmpty))
  }

  test("SQL surface: unigram_tokenize and bpe_tokenize registered") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT unigram_tokenize('the window') AS u, " +
      "bpe_tokenize('the data') AS b").collect().head
    assert(r.getSeq[String](0) == Seq("the", "win", "dow"))
    assert(r.getSeq[String](1).nonEmpty)
  }
}
