package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity

/**
 * Property obligations for the round-8 operators, against reference
 * implementations in plain Scala:
 *  - boundedHashSample equals the naive "n smallest (md5-prefix, id)"
 *    selection on random id sets, at any cap;
 *  - assignAgainst equals the naive per-vector argmax-cosine with ties
 *    to the smallest cell, including zero vectors (cell −1) and
 *    duplicate-score centers;
 *  - semDedupRecallMulti equals running the single-quantizer gate per
 *    quantizer (the shared pair join must not change any count).
 */
class Round8Properties extends AnyFunSuite {
  import SparkTestSession._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    PropertySamples.samples(g, n, 8042L)

  // ---- boundedHashSample vs naive smallest-hash selection ----

  private val idsGen: Gen[(List[Long], Int)] = for {
    n <- Gen.choose(1, 60)
    ids <- Gen.listOfN(n, Gen.choose(1L, 100000L))
    cap <- Gen.choose(1, 20)
  } yield (ids.distinct, cap)

  test("property: boundedHashSample == n smallest (md5-prefix, id)") {
    import spark.implicits._
    samples(idsGen, 8).foreach { case (ids, cap) =>
      val df = ids.map(i => (i, s"v$i")).toDF("id", "payload")
      val got = Similarity.boundedHashSample(df, "id", cap)
        .collect().map(_.getLong(0)).toSeq.sorted
      val want = ids
        .sortBy(i => (graft.functions.Md5Prefix28.eval(
          org.apache.spark.unsafe.types.UTF8String.fromString(i.toString)),
          i))
        .take(cap).sorted
      assert(got == want, s"ids=$ids cap=$cap")
    }
  }

  // ---- assignAgainst vs naive argmax cosine ----

  private val assignGen: Gen[(List[(Long, Array[Double])],
    List[(Int, Array[Double])])] = for {
    nv <- Gen.choose(1, 12)
    nc <- Gen.choose(1, 5)
    dims = 4
    vecs <- Gen.listOfN(nv, Gen.listOfN(dims,
      Gen.oneOf(-1.0, 0.0, 0.5, 1.0, 2.0)))
    cents <- Gen.listOfN(nc, Gen.listOfN(dims,
      Gen.oneOf(0.0, 0.5, 1.0)))
  } yield (vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) },
    cents.zipWithIndex.map { case (c, i) => (i, c.toArray) })

  private def naiveAssign(vecs: Seq[(Long, Array[Double])],
                          cents: Seq[(Int, Array[Double])]): Map[Long, Int] = {
    def norm(a: Array[Double]) = math.sqrt(a.map(x => x * x).sum)
    vecs.map { case (id, v) =>
      val vn = norm(v)
      val scored = cents.flatMap { case (c, ct) =>
        val cn = norm(ct)
        if (vn * cn > 0.0) {
          val cos = v.zip(ct).map { case (a, b) => a * b }.sum / (vn * cn)
          if (cos.isNaN) None else Some((c, cos))
        } else None
      }
      // max cosine, ties to the SMALLER cell id (assignCells' TopKAgg
      // emission policy); nothing scorable → cell -1
      id -> (if (scored.isEmpty) -1
             else scored.minBy { case (c, cos) => (-cos, c) }._1)
    }.toMap
  }

  test("property: assignAgainst == naive argmax cosine (ties to smaller cell)") {
    import spark.implicits._
    samples(assignGen, 8).foreach { case (vecs, cents) =>
      val batch = vecs.toSeq.map { case (id, v) => (id, v) }
        .toDF("vec_id", "embedding")
      val centers = cents.toSeq.map { case (c, ct) => (c, ct) }
        .toDF("__cell", "__center")
      val got = Similarity.assignAgainst(centers, batch, "vec_id",
        "embedding")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == naiveAssign(vecs, cents), s"vecs=${vecs.map(_._1)}")
    }
  }

  // ---- multi-quantizer recall gate vs per-quantizer runs ----

  private val recallGen: Gen[List[(Long, Array[Double], Int, Int)]] = for {
    n <- Gen.choose(2, 14)
    rows <- Gen.listOfN(n, for {
      v <- Gen.listOfN(3, Gen.oneOf(0.0, 0.3, 1.0))
      c1 <- Gen.choose(0, 2)
      c2 <- Gen.choose(0, 1)
    } yield (v.toArray, c1, c2))
  } yield rows.zipWithIndex.map { case ((v, c1, c2), i) =>
    (i.toLong, v, c1, c2)
  }

  test("property: semDedupRecallMulti == per-quantizer semDedupRecall") {
    import spark.implicits._
    samples(recallGen, 6).foreach { rows =>
      val df = rows.toDF("vec_id", "embedding", "ca", "cb")
      def rowsOf(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
      val multi = rowsOf(Similarity.semDedupRecallMulti(df, "vec_id",
        "embedding", Seq("qa" -> "ca", "qb" -> "cb"), 0.5))
      val single = rowsOf(
        Similarity.semDedupRecall(df, "vec_id", "embedding", "ca", 0.5, "qa")
          .unionByName(Similarity.semDedupRecall(df, "vec_id", "embedding",
            "cb", 0.5, "qb")))
      assert(multi == single, s"rows=${rows.map(_._1)}")
    }
  }
}
