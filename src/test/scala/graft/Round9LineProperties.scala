package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dedup

/** Property obligations for the line-dedup family: both engine forms
  * ([[Dedup.dedupLines]] exact, [[Dedup.dedupLinesByHash]] 60-bit) are
  * checked against a NAIVE in-memory reference on seeded random corpora,
  * plus the identity law (no line clears minDocs → every document comes
  * back byte-exact). The DuckDB oracle proves the contract query; this
  * proves the OPERATOR on corpora the fixture corpus cannot reach
  * (empty lines, all-duplicate docs, newline runs, single-doc corpora). */
class Round9LineProperties extends AnyFunSuite {
  import SparkTestSession._

  /** The spec in one function: strip lines (length >= minChars) present
    * in >= minDocs distinct docs; rejoin survivors in order. */
  private def naive(docs: Seq[(Long, String)], minDocs: Int,
                    minChars: Int): Map[Long, (String, Long)] = {
    val lineDocs = docs
      .flatMap { case (id, t) => t.split("\n", -1).map(l => (l, id)) }
      .filter(_._1.length >= minChars)
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
    val dup = lineDocs.filter(_._2 >= minDocs).keySet
    docs.map { case (id, t) =>
      val ls = t.split("\n", -1)
      val kept = ls.filterNot(dup.contains)
      id -> (kept.mkString("\n"), (ls.length - kept.length).toLong)
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], minDocs: Int, minChars: Int,
                  hashed: Boolean): Map[Long, (String, Long)] = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val out = if (hashed)
      Dedup.dedupLinesByHash(df, "doc_id", "text", minDocs, minChars)
    else Dedup.dedupLines(df, "doc_id", "text", minDocs, minChars)
    out.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
  }

  private def randomCorpus(seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    // small line vocabulary FORCES cross-doc duplicates; a few lines are
    // under the min-chars floor on purpose
    val vocab = Seq("shared boilerplate navigation header line",
      "all rights reserved legal footer text",
      "x", "--", "",
      s"unique-$seed alpha content with enough characters",
      s"unique-$seed beta body line that is long enough",
      s"unique-$seed gamma closing paragraph of the document")
    (0L until 8L).map { id =>
      val n = 1 + rnd.nextInt(6)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString("\n")
    }
  }

  test("exact and hashed forms match the naive reference on seeded corpora") {
    for (seed <- 1L to 6L) {
      val corpus = randomCorpus(seed)
      val want = naive(corpus, minDocs = 2, minChars = 10)
      assert(run(corpus, 2, 10, hashed = false) == want, s"exact, seed=$seed")
      assert(run(corpus, 2, 10, hashed = true) == want, s"hashed, seed=$seed")
    }
  }

  test("identity law: minDocs above the corpus size removes nothing") {
    val corpus = randomCorpus(99L)
    val out = run(corpus, minDocs = corpus.size + 1, minChars = 1,
      hashed = false)
    corpus.foreach { case (id, t) =>
      assert(out(id) == ((t, 0L)), s"doc $id changed under identity")
    }
  }

  test("plan shape: no cartesian/nested-loop expansion in either form") {
    import spark.implicits._
    val df = randomCorpus(7L).toDF("doc_id", "text")
    for (hashed <- Seq(false, true)) {
      val out = if (hashed)
        Dedup.dedupLinesByHash(df, "doc_id", "text", 2, 10)
      else Dedup.dedupLines(df, "doc_id", "text", 2, 10)
      val plan = out.queryExecution.executedPlan.toString
      // the anti join and both aggregates must stay keyed — a corpus ×
      // corpus expansion would surface as one of these nodes
      assert(!plan.contains("CartesianProduct"), s"hashed=$hashed:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"hashed=$hashed:\n$plan")
    }
  }

  test("degenerate corpora: single doc, all-identical docs, newline runs") {
    // single doc: nothing can clear minDocs = 2
    val single = Seq(1L -> "only line one\nonly line two here")
    assert(run(single, 2, 10, hashed = false) == naive(single, 2, 10))
    // all-identical docs: every long line stripped everywhere
    val same = (1L to 3L).map(_ -> "identical body line content\nshort")
    val got = run(same, 2, 10, hashed = false)
    assert(got == naive(same, 2, 10))
    assert(got(1L) == (("short", 1L)), s"${got(1L)}")
    // newline runs produce EMPTY lines — never dedup keys, always kept
    val runs = Seq(1L -> "first real line of this doc\n\n\nlast one here",
      2L -> "first real line of this doc\n\n\nother tail line")
    val got2 = run(runs, 2, 10, hashed = true)
    assert(got2 == naive(runs, 2, 10))
    assert(got2(1L)._1.startsWith("\n\n"), "empty lines must survive")
  }
}
