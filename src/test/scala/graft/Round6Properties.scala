package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Similarity, TextFns}

/**
 * Property obligations for the round-6 operators, against reference
 * implementations in plain Scala:
 *  - unigramLmScore equals the naive term-ordered fold bit-for-bit on
 *    random corpora (same IEEE op sequence → exact double equality);
 *  - semDedupByCell equals naive within-cell union-find, including
 *    zero vectors (NaN cosine must never merge) and cross-cell blinding.
 */
class Round6Properties extends AnyFunSuite {
  import SparkTestSession._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    PropertySamples.samples(g, n, 2042L)

  // ---- unigram LM vs naive fold ----

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 8)
      toks <- Gen.listOfN(len, Gen.oneOf(
        "ta", "tb", "tc", "td", "te", "tf", "tg", "th"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def naiveUnigram(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Double)] = {
    val tokens = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val cf = tokens.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val n = cf.values.sum
    tokens.map { case (id, ts) =>
      val tf = ts.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // same op sequence as the operator: per-term tf·(N/cf) summed in
      // term-lexicographic order, then n/sum
      val inv = tf.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (t, c)) =>
        acc + c.toDouble * (n.toDouble / cf(t).toDouble)
      }
      id -> ((ts.size.toLong, tf.size.toLong, ts.size.toDouble / inv))
    }.toMap
  }

  test("property: unigramLmScore equals the naive term-ordered fold exactly") {
    import spark.implicits._
    samples(corpusGen, 6).foreach { docs =>
      val got = TextFns.unigramLmScore(
        docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val want = naiveUnigram(docs)
      assert(got.keySet == want.keySet)
      got.foreach { case (id, (nt, nd, hm)) =>
        val (wnt, wnd, whm) = want(id)
        assert(nt == wnt && nd == wnd, s"doc $id counts")
        assert(java.lang.Double.doubleToLongBits(hm) ==
          java.lang.Double.doubleToLongBits(whm),
          s"doc $id hm_prob $hm != $whm (not bit-identical)")
      }
    }
  }

  // ---- semDedupByCell vs naive within-cell union-find ----

  private val vecsGen: Gen[List[(Long, String, Array[Float])]] = for {
    n <- Gen.choose(2, 14)
    rows <- Gen.listOfN(n, for {
      cell <- Gen.oneOf("c0", "c1")
      // components from a coarse grid, zero vectors included on purpose
      v <- Gen.listOfN(3, Gen.oneOf(-1.0f, -0.5f, 0.0f, 0.5f, 1.0f))
    } yield (cell, v.toArray))
  } yield rows.zipWithIndex.map { case ((c, v), i) => (i.toLong, c, v) }

  private def naiveSemDedup(rows: Seq[(Long, String, Array[Float])],
                            tau: Double): Map[Long, (Long, Boolean)] = {
    // same op sequence as Similarity.dot/norm: sequential double fold
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long =
      if (parent.getOrElse(x, x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    for {
      (ia, ca, va) <- rows; (ib, cb, vb) <- rows
      if ca == cb && ia < ib
      c = cos(va, vb)
      if !c.isNaN && c >= tau
    } {
      val (ra, rb) = (find(ia), find(ib))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    rows.map { case (id, _, _) =>
      val root = find(id)
      id -> ((root, root == id))
    }.toMap
  }

  test("property: semDedupByCell equals naive union-find, NaN-safe") {
    import spark.implicits._
    samples(vecsGen, 6).foreach { rows =>
      val got = Similarity.semDedupByCell(
        rows.toDF("vec_id", "label", "embedding"),
        "vec_id", "embedding", "label", tau = 0.9)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getBoolean(2)))).toMap
      val want = naiveSemDedup(rows, tau = 0.9)
      assert(got == want, s"mismatch on ${rows.size} rows")
    }
  }
}
