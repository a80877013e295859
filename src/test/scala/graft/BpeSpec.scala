package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

/** The BPE tokenizer vs an INDEPENDENT plain-Scala reference model:
  * the model pre-tokenizes with java.util.regex (the expression walks
  * code points by hand) and picks each round's merge by scanning the
  * TABLE in rank order for the first applicable pair (the expression
  * scans the SEGMENTS and minimizes rank) — different algorithms that
  * must agree on every input. */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val wordRe = java.util.regex.Pattern
    .compile("[a-z0-9]+|[^a-z0-9 \t\n\r\f]")

  private def refWord(w: String): Seq[String] = {
    var segs: List[String] = w.map(_.toString).toList
    if (segs.length > Bpe.maxWordChars) return segs
    var done = false
    while (!done && segs.length > 1) {
      // first table entry (rank order) applicable anywhere in the word
      Bpe.defaultMerges.find { case (a, b) =>
        segs.zip(segs.tail).contains((a, b))
      } match {
        case None => done = true
        case Some((a, b)) =>
          // merge all left-to-right non-overlapping occurrences
          val out = scala.collection.mutable.ListBuffer[String]()
          var rest = segs
          while (rest.nonEmpty) rest match {
            case x :: y :: tail if x == a && y == b =>
              out += (a + b); rest = tail
            case x :: tail => out += x; rest = tail
            case Nil => ()
          }
          segs = out.toList
      }
    }
    segs
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
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
      .select(col("i"), Bpe.tokens(col("t")).as("toks"))
      .orderBy("i").collect()
      .map(_.getSeq[String](1).toList.map(identity)).toSeq

  test("hand-derived merge chains (order dependence) match") {
    val cases = Map(
      "the" -> Seq("the"),                    // (t,h) then (th,e)
      "join" -> Seq("join"),                  // (i,n), (j,o), (jo,in)
      "window" -> Seq("w", "ind", "ow"),      // (i,n), (o,w), (in,d)
      "hash" -> Seq("has", "h"),              // (h,a) beats the late (a,s)
      "data" -> Seq("d", "at", "a"),          // (a,t) blocks (t,a)
      "order" -> Seq("or", "d", "er"),        // (e,r) first, then (o,r)
      "query" -> Seq("qu", "er", "y"),        // (e,r) blocks (u,e), (r,y)
      "merge" -> Seq("m", "er", "g", "e"),    // (e,r) blocks (m,e)
      "batch" -> Seq("b", "at", "c", "h"),
      "aaa" -> Seq("a", "a", "a"),            // no (a,a) merge exists
      "zzz" -> Seq("z", "z", "z"),
      "," -> Seq(","))
    val got = viaExpr(cases.keys.toSeq)
    cases.keys.toSeq.zip(got).foreach { case (in, g) =>
      assert(g == cases(in), s"input: '$in'")
      assert(g == refWord(in), s"model drift on '$in'")
    }
  }

  test("edge cases match the reference model") {
    val cases = Seq(null, "", " ", "\t\n\r\f", "the window, 42!",
      "a" * 51, "x" + "a" * 60 + "y", "r3xjoin r3xthe",
      "mixed...punct!!and0digits9")
    val got = viaExpr(cases)
    cases.zip(got).foreach { case (in, g) =>
      assert(g == refTokenize(in), s"input: '$in'")
    }
  }

  test("random texts match the reference model (200 samples)") {
    val alphabet = Gen.frequency(
      8 -> Gen.alphaLowerChar,
      2 -> Gen.numChar,
      3 -> Gen.const(' '),
      1 -> Gen.oneOf('\t', '\n', '\r', '\f'),
      1 -> Gen.oneOf('.', ',', '!', '?', '(', ')', '-'),
      1 -> Gen.oneOf('é', '中', 'A'))
    val corpusWord = Gen.oneOf("the", "join", "window", "hash", "data",
      "order", "query", "stream", "customer", "value", "batch", "scan")
    val g = for {
      n <- Gen.choose(0, 80)
      cs <- Gen.listOfN(n, alphabet)
      ws <- Gen.listOfN(3, corpusWord)
    } yield (cs.mkString + " " + ws.mkString(" "))
    val texts = PropertySamples.samples(g, 200, seedBase = 1402L)
    val got = viaExpr(texts)
    texts.zip(got).foreach { case (t, g2) =>
      assert(g2 == refTokenize(t), s"input: '$t'")
    }
  }

  test("merges as data: a SHUFFLED-storage merge table reproduces the " +
    "default tokenization (rank order restored), a truncated one diverges") {
    // the default table landed as rows in scrambled storage order with
    // explicit ranks — mergesFrom must sort by rank, so tokens are
    // bit-identical to the compile-time fixture on random text
    val scrambled = new scala.util.Random(1502L)
      .shuffle(Bpe.defaultMerges.zipWithIndex.toList)
      .map { case ((a, b), r) => (a, b, r.toLong) }
    val loaded = Bpe.mergesFrom(
      scrambled.toDF("left", "right", "rank"))
    assert(loaded == Bpe.defaultMerges,
      "mergesFrom must restore rank order from the rank column")
    val g = for {
      n <- Gen.choose(0, 60)
      cs <- Gen.listOfN(n, Gen.frequency(8 -> Gen.alphaLowerChar,
        2 -> Gen.const(' ')))
    } yield cs.mkString
    val texts = PropertySamples.samples(g, 50, seedBase = 1502L)
    val viaLoaded = texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t")
      .select(col("i"), Bpe.tokens(col("t"), loaded).as("toks"))
      .orderBy("i").collect()
      .map(_.getSeq[String](1).toList.map(identity)).toSeq
    assert(viaLoaded == viaExpr(texts))
    // a PREFIX of the merge list is a different tokenizer: "the" stops
    // merging at "th" + "e" once rank 1 is dropped
    val truncated = Bpe.mergesFrom(
      scrambled.filter(_._3 < 1).toDF("left", "right", "rank"))
    val viaTrunc = Seq(Tuple1("the")).toDF("t")
      .select(Bpe.tokens(col("t"), truncated).as("toks"))
      .collect().head.getSeq[String](0)
    assert(viaTrunc == Seq("th", "e"))
  }

  test("tokenCount is the token array's size as a long") {
    val df = Seq("the window", "", "join query hash").toDF("t")
      .select(Bpe.tokenCount(col("t")).as("n"),
        size(Bpe.tokens(col("t"))).cast("long").as("m"))
    assert(df.collect().forall(r => r.getLong(0) == r.getLong(1)))
  }
}
