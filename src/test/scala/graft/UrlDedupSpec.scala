package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, TextClean}

/** URL canonicalization vs an independent plain-Scala model (java.util
  * string/regex ops vs the Column composition), plus the keep-best
  * dedup contract. */
class UrlDedupSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // ---- reference model: the stated rules, in plain Scala ----
  private val preRe = java.util.regex.Pattern
    .compile("^([A-Za-z][A-Za-z0-9+.-]*)://([^/]*)(.*)$")

  private def refCanon(u: String): String = {
    val stripped = u.replaceAll("#.*$", "")
    val qi = stripped.indexOf('?')
    val (pre, q) =
      if (qi < 0) (stripped, "")
      else (stripped.substring(0, qi), stripped.substring(qi + 1))
    val m = preRe.matcher(pre)
    val (scheme, hostport, path) =
      if (m.matches())
        (m.group(1).toLowerCase, m.group(2), m.group(3))
      else ("", "", "")
    val parts = hostport.split(":", -1)
    val host = parts(0).toLowerCase
    val port = if (parts.length > 1) parts(1) else ""
    val portPart =
      if (port.isEmpty || (scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443")) ""
      else ":" + port
    val kept = q.split("&", -1).toSeq
      .filterNot(_.matches(TextClean.TrackingParamRe)).sorted
    val qPart =
      if (q.isEmpty || kept.isEmpty) "" else "?" + kept.mkString("&")
    scheme + "://" + host + portPart + path + qPart
  }

  private def viaColumn(urls: Seq[String]): Seq[String] =
    urls.zipWithIndex.map { case (u, i) => (i, u) }.toDF("i", "u")
      .select(col("i"), TextClean.canonicalizeUrl(col("u")).as("c"))
      .orderBy("i").collect().map(_.getString(1)).toSeq

  test("canonicalization edge cases match the model") {
    val cases = Seq(
      "https://Example.COM/path/Page",
      "https://example.com:443/path/Page",
      "HTTP://example.com:80/x",
      "http://example.com:8080/x",           // non-default port kept
      "https://example.com/x#frag",
      "https://example.com/x#a?b=1",         // '?' inside fragment
      "https://example.com/x?utm_source=a&utm_medium=b",
      "https://example.com/x?b=2&a=1&id=9",
      "https://example.com/x?ref&gclid=1&z=1",
      "https://example.com/x?",              // empty query
      "https://example.com",                  // no path
      "https://example.com?a=1",              // query, no path
      "not a url at all",
      "ftp://Files.Example.com:21/pub/File")
    val got = viaColumn(cases)
    cases.zip(got).foreach { case (u, g) =>
      assert(g == refCanon(u), s"url: $u")
    }
    // pinned facts anchoring the model itself
    assert(refCanon("https://Example.COM:443/A?b=1&a=1&utm_x=9#f") ==
      "https://example.com/A?a=1&b=1")
    assert(refCanon("HTTP://h.co:80/x?ref") == "http://h.co/x")
  }

  test("random messy URLs match the model (200 samples)") {
    val g = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "HtTpS", "ftp")
      host <- Gen.oneOf("Example.COM", "example.com", "EXAMPLE.com",
        "a.B.c", "h-1.co")
      port <- Gen.oneOf("", ":80", ":443", ":8080", ":")
      path <- Gen.oneOf("", "/", "/Path/Sub", "/p1", "/p1/")
      nq <- Gen.choose(0, 5)
      params <- Gen.listOfN(nq, Gen.oneOf("a=1", "b=2", "id=7", "c",
        "utm_source=x", "utm_medium", "gclid=z", "ref", "ref=self",
        "a=2", ""))
      frag <- Gen.oneOf("", "#frag", "#a?b=1", "#")
      q = if (params.isEmpty) "" else "?" + params.mkString("&")
    } yield s"$scheme://$host$port$path$q$frag"
    val urls = PropertySamples.samples(g, 200, seedBase = 1310L)
    val got = viaColumn(urls)
    urls.zip(got).foreach { case (u, g2) =>
      assert(g2 == refCanon(u), s"url: $u")
    }
  }

  test("byCanonicalUrl keeps the highest-quality doc, smallest id on ties") {
    val df = Seq(
      (1L, "https://A.com/x?utm_source=t", 10L),
      (2L, "https://a.com/x", 50L),   // best quality → keeper
      (3L, "https://a.com:443/x#f", 50L), // tie on quality → id 2 wins
      (4L, "http://b.org/y?b=2&a=1", 7L),
      (5L, "http://b.org/y?a=1&b=2", 7L), // tie → id 4 wins
      (6L, "http://c.net/z", 1L))
      .toDF("doc_id", "url", "q")
    val got = Dedup.byCanonicalUrl(df, "url", col("q"), "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      ("https://a.com/x", 2L, 3L),
      ("http://b.org/y?a=1&b=2", 4L, 2L),
      ("http://c.net/z", 6L, 1L)))
  }
}
