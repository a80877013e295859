package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ShingleHash, TextFns}

/** Bit-parity of the native [[ShingleHash]] expression against the
  * composed form it replaced in the dedup inverted indexes:
  * `transform(TextFns.shingles(text, n), s => hashXX(s))`. The dedup
  * family's oracles mirror the COMPOSED form in SQL, so element-for-
  * element equality here (plus the full verify run) is what licenses
  * the swap. */
class Round9ShingleProperties extends AnyFunSuite {
  import SparkTestSession._

  private def hash28c(s: org.apache.spark.sql.Column) =
    graft.functions.Md5Prefix28(s)
  private def hash60c(s: org.apache.spark.sql.Column) =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  // the adversarial corners: empties, single words, leading/trailing/
  // double spaces (empty "words" are real words to the split), non-ASCII
  // multi-byte text, repeated shingles (distinctness), 28-bit-colliding
  // repeats, long runs
  private val edgeTexts = Seq(
    null, "", " ", "  ", "a", "a b", "a b c", "a b c d",
    "a  b c", " a b c", "a b c ", "a b c  ", "   ",
    "the the the the the", "a b a b a b a b",
    "héllo wörld ünïcode tëxt", "日本 語 の 文 章",
    "tab\tis not a sep b c", "new\nline keeps going c d",
    "x " * 200 + "end", ("w1 w2 w3 " * 50).trim)

  private def compare(n: Int): Unit = {
    import spark.implicits._
    val docs = edgeTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val both = docs.select(col("id"),
      ShingleHash.h28(col("text"), n).as("native28"),
      transform(TextFns.shingles(col("text"), n),
        s => hash28c(s)).as("composed28"),
      ShingleHash.h60(col("text"), n).as("native60"),
      transform(TextFns.shingles(col("text"), n),
        s => hash60c(s)).as("composed60"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"28-bit mismatch n=$n id=${r.getLong(0)}: " +
          s"${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}")
      assert(r.getSeq[Long](3) == r.getSeq[Long](4),
        s"60-bit mismatch n=$n id=${r.getLong(0)}: " +
          s"${r.getSeq[Long](3)} vs ${r.getSeq[Long](4)}")
    }
  }

  test("native == composed on edge-case texts, n = 1, 2, 3, 5") {
    Seq(1, 2, 3, 5).foreach(compare)
  }

  test("native == composed on random texts (seeded fuzz)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    // alphabet biased toward spaces and repeats so distinctness and
    // empty-word paths fire constantly; includes a multi-byte char
    val alpha = "ab  c λ"
    val docs = (1 to 300).map { i =>
      val len = rnd.nextInt(120)
      (i.toLong, (0 until len).map(_ => alpha(rnd.nextInt(alpha.length)))
        .mkString)
    }.toDF("id", "text")
    val bad = docs.select(
      ShingleHash.h28(col("text")).as("n28"),
      transform(TextFns.shingles(col("text")), s => hash28c(s)).as("c28"),
      ShingleHash.h60(col("text")).as("n60"),
      transform(TextFns.shingles(col("text")), s => hash60c(s)).as("c60"),
      col("text"))
      .filter(col("n28") =!= col("c28") || col("n60") =!= col("c60"))
      .collect()
    assert(bad.isEmpty, s"diverged on: ${bad.take(3).mkString("; ")}")
  }

  test("dedup family results are unchanged by the swap (string-set anchor)") {
    import spark.implicits._
    // a corpus with a real near-dup pair, a containment pair, and noise
    val base = "the quick brown fox jumps over the lazy dog near the river " +
      "bank where tall green trees grow beside the old wooden bridge"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("lazy", "sleepy")),
      (3L, "completely unrelated content about cooking pasta with garlic " +
        "and olive oil in a large iron pan over medium heat until done"),
      (4L, base + " and the sun sets slowly behind the distant purple hills"),
      (5L, "")).toDF("doc_id", "text")
    val jac = graft.functions.Dedup
      .ngramJaccard(docs, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.contains((1L, 2L)), s"near-dup pair lost: $jac")
    val cont = graft.functions.Dedup
      .ngramContainment(docs, "doc_id", "text", minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont.contains((1L, 4L)), s"containment pair lost: $cont")
    // index-only twins agree with the exact forms on this corpus
    val jacH = graft.functions.Dedup
      .ngramJaccardByHash(docs, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jacH == jac, s"h60 twin diverged: $jacH vs $jac")
  }
}
