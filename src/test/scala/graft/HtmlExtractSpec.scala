package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextClean

/** htmlExtract vs an INDEPENDENT plain-Scala model: the model
  * re-implements the documented rule chain as char-level walks (no
  * regex anywhere), one walk per rule pass — the passes stay separate
  * on purpose, because multi-pass regex semantics differ from a fused
  * walk when replacements expose new `<…>` spans. Shared bugs would
  * have to be shared across a regex chain and a hand parser. */
class HtmlExtractSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // ---- reference model (char walks, rule for rule) ----

  private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** rule 1: drop <!-- … --> (nearest close); unclosed stays. */
  private def dropComments(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.startsWith("<!--", i)) {
        val end = s.indexOf("-->", i + 4)
        if (end >= 0) i = end + 3
        else { sb.append(s(i)); i += 1 }
      } else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }

  /** rule 2: drop one tag's subtree — `<t\b[^>]*>` through the nearest
    * `</t[ws]*>`, case-insensitive; unclosed opens stay. */
  private def dropSubtrees(s: String, t: String): String = {
    val sb = new StringBuilder
    val lower = s.toLowerCase
    var i = 0
    while (i < s.length) {
      val boundary = lower.startsWith("<" + t, i) && {
        val a = i + 1 + t.length
        a >= s.length || !isWord(s(a))
      }
      val gt = if (boundary) s.indexOf('>', i) else -1
      if (boundary && gt >= 0) {
        var j = gt + 1
        var closed = -1
        while (closed < 0 && j < s.length) {
          if (lower.startsWith("</" + t, j)) {
            var k = j + 2 + t.length
            while (k < s.length && " \t\n\r".indexOf(s(k)) >= 0) k += 1
            if (k < s.length && s(k) == '>') closed = k else j += 1
          } else j += 1
        }
        if (closed >= 0) i = closed + 1
        else { sb.append(s(i)); i += 1 }
      } else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }

  /** rule 3: block-tag boundaries → '\n' (own pass — later rules see
    * the inserted newlines, exactly like the regex chain). */
  private def blockToNl(s: String): String = {
    val sb = new StringBuilder
    val lower = s.toLowerCase
    var i = 0
    while (i < s.length) {
      val m =
        if (s(i) != '<') -1
        else {
          val o = if (i + 1 < s.length && s(i + 1) == '/') i + 2 else i + 1
          TextClean.HtmlBlockTags.find { t =>
            lower.startsWith(t, o) && {
              val a = o + t.length
              a >= s.length || !isWord(s(a))
            }
          } match {
            case Some(_) => s.indexOf('>', i)
            case None => -1
          }
        }
      if (m >= 0) { sb.append('\n'); i = m + 1 }
      else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }

  /** rule 4: drop every remaining <…>; a '<' with no '>' stays. */
  private def stripTags(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val gt = if (s(i) == '<') s.indexOf('>', i) else -1
      if (gt >= 0) i = gt + 1
      else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }

  /** rules 5–6: entities in table order, then the whitespace walks. */
  private def entitiesAndWs(s0: String): String = {
    var s = s0
    TextClean.HtmlEntities.foreach { case (e, v) => s = s.replace(e, v) }
    // [ \t\r\f]+ → ' '
    val w1 = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (" \t\r\f".indexOf(s(i)) >= 0) {
        w1.append(' ')
        while (i < s.length && " \t\r\f".indexOf(s(i)) >= 0) i += 1
      } else { w1.append(s(i)); i += 1 }
    }
    s = w1.toString
    // ' ?\n ?' → '\n' (left-to-right, non-overlapping, like the regex)
    val w2 = new StringBuilder
    i = 0
    while (i < s.length) {
      if (s(i) == '\n' || (s(i) == ' ' && i + 1 < s.length && s(i + 1) == '\n')) {
        if (s(i) == ' ') i += 1
        w2.append('\n'); i += 1
        if (i < s.length && s(i) == ' ') i += 1
      } else { w2.append(s(i)); i += 1 }
    }
    s = w2.toString
    // \n{3,} → \n\n
    val w3 = new StringBuilder
    i = 0
    while (i < s.length) {
      if (s(i) == '\n') {
        var n = 0
        while (i < s.length && s(i) == '\n') { n += 1; i += 1 }
        w3.append(if (n >= 3) "\n\n" else "\n" * n)
      } else { w3.append(s(i)); i += 1 }
    }
    s = w3.toString
    // trim [ \n] both ends
    s.dropWhile(c => c == ' ' || c == '\n')
      .reverse.dropWhile(c => c == ' ' || c == '\n').reverse
  }

  private def model(html: String): String =
    if (html == null) ""
    else entitiesAndWs(stripTags(blockToNl(
      Seq("script", "style", "noscript").foldLeft(dropComments(html))(
        dropSubtrees))))

  private def viaExpr(texts: Seq[String]): Seq[String] =
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
      .select(col("i"), TextClean.htmlExtract(col("t")).as("x"))
      .orderBy("i").collect().map(_.getString(1)).toSeq

  test("edge cases match the model") {
    val cases = Seq(
      null,
      "",
      "plain text, no markup",
      "<p>a</p><p>b</p>",
      "<P CLASS='x'>upper</P>",
      "a<br/>b<br />c",
      "<script>if(a<b){x()}</script>kept",
      "<SCRIPT>loud</script>kept",
      "<script>unclosed leaks through",
      "<style>p{}</style><noscript>n</noscript>t",
      "<!-- gone -->kept<!-- unclosed stays",
      "<!--a<!--b-->c",
      "x &lt;tag&gt; &amp;amp; &nbsp;&#39;q&#39; &#160;y",
      "broken &amp entity &#xx; stays",
      "a  \t  b \r\n c",
      "a\n\n\n\n\nb",
      "  \n padded \n  ",
      "lone < bracket and > other",
      "<div><ul><li>one</li><li>two</li></ul></div>",
      "<scripty>not a script tag</scripty>",
      "<a href=\"q>r\">odd attr</a>",
      "<table><tr><td>c1</td><td>c2</td></tr></table>")
    val got = viaExpr(cases)
    cases.zip(got).foreach { case (in, g) =>
      assert(g == model(in), s"input: '$in'")
    }
  }

  test("random markup soup matches the model (200 samples)") {
    val word = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val piece: Gen[String] = Gen.frequency(
      8 -> word.map(_ + " "),
      2 -> Gen.oneOf(TextClean.HtmlEntities.map(_._1)),
      1 -> Gen.oneOf("&amp", "&#xx;", "&bogus;"),
      3 -> Gen.oneOf(TextClean.HtmlBlockTags).map(t => s"<$t>"),
      3 -> Gen.oneOf(TextClean.HtmlBlockTags).map(t => s"</$t>"),
      2 -> Gen.oneOf("span", "b", "em", "a href=\"u\"").map(t => s"<$t>"),
      2 -> Gen.oneOf("span", "b", "em").map(t => s"</$t>"),
      1 -> word.map(w => s"<script>if(a<b){$w}</script>"),
      1 -> word.map(w => s"<style>.$w{}</style>"),
      1 -> Gen.const("<script>unclosed "),
      1 -> word.map(w => s"<!-- $w -->"),
      1 -> Gen.const("<!-- unclosed "),
      1 -> Gen.oneOf("<", ">", "< ", " >"),
      1 -> Gen.oneOf("\n", "\n\n\n", "\t", "  ", "\r\n"),
      1 -> Gen.const("<br/>"))
    val g = for {
      n <- Gen.choose(0, 40)
      ps <- Gen.listOfN(n, piece)
    } yield ps.mkString
    val texts = PropertySamples.samples(g, 200, seedBase = 1401L)
    val got = viaExpr(texts)
    texts.zip(got).foreach { case (in, out) =>
      assert(out == model(in), s"input: '$in'")
    }
  }
}
