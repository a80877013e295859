package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.model.ChangesetSchema
import graft.operators.Materializer

/**
 * Property tests for the §7.3.2 proof obligation: latest-per-key + set
 * apply ≡ serial row-at-a-time apply (the reference's semantics), for any
 * changelog; plus idempotency and batch-split invariance of the versioned
 * merge.
 */
class MergeProperties extends AnyFunSuite {
  import SparkTestSession._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    PropertySamples.samples(g, n, 42L)

  private val rowSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private case class Ev(id: Long, action: String, k: Long, v: String)

  private val evGen: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 40)
    evs <- Gen.listOfN(n, for {
      action <- Gen.oneOf("INSERT", "UPDATE", "DELETE")
      k <- Gen.choose(0L, 7L)
      v <- Gen.alphaStr.map(_.take(4))
    } yield (action, k, v))
  } yield evs.zipWithIndex.map { case ((a, k, v), i) => Ev(i.toLong, a, k, v) }

  /** The reference's serial apply loop (axon.go:143-173, 277-322):
    * insert skips existing keys, update upserts, delete removes. */
  private def serialApply(evs: Seq[Ev]): Map[Long, String] =
    evs.sortBy(_.id).foldLeft(Map.empty[Long, String]) { (st, e) =>
      e.action match {
        case "INSERT" => if (st.contains(e.k)) st else st + (e.k -> e.v)
        case "UPDATE" => st + (e.k -> e.v)
        case "DELETE" => st - e.k
      }
    }

  private def toDf(evs: Seq[Ev]) = {
    val rows = evs.map(e => Row(e.id, null, e.action, "p", "t", 1L,
      if (e.action == "DELETE") null
      else s"""{"k":${e.k},"v":"${e.v}"}""",
      s"""{"k":${e.k}}"""))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4),
      ChangesetSchema.schema)
  }

  private def viewOf(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    Materializer.currentView(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("versioned merge over any changelog ≡ the reference's serial apply") {
    samples(evGen, 25).foreach { evs =>
      val got = viewOf(Materializer.mergeVersioned(
        Materializer.emptyVersionedState(spark, rowSchema),
        toDf(evs), "k", rowSchema))
      assert(got == serialApply(evs), s"changelog: $evs")
    }
  }

  test("split into contiguous in-order batches ≡ single batch ≡ serial") {
    samples(evGen.suchThat(_.nonEmpty), 15).zipWithIndex.foreach {
      case (evs, i) =>
        val parts = (i % 4) + 2
        val empty = Materializer.emptyVersionedState(spark, rowSchema)
        val chunk = math.max(1, evs.length / parts)
        val batched = evs.grouped(chunk).foldLeft(empty) { (st, slice) =>
          Materializer.mergeVersioned(st, toDf(slice), "k", rowSchema)
        }
        assert(viewOf(batched) == serialApply(evs),
          s"parts=$parts changelog: $evs")
    }
  }

  test("replayed and stale batches never regress state") {
    samples(evGen.suchThat(_.length >= 4), 10).foreach { evs =>
      val empty = Materializer.emptyVersionedState(spark, rowSchema)
      val (first, second) = evs.splitAt(evs.length / 2)
      val applied = Materializer.mergeVersioned(
        Materializer.mergeVersioned(empty, toDf(first), "k", rowSchema),
        toDf(second), "k", rowSchema)
      val expect = viewOf(applied)
      // replay the second batch → no-op
      assert(viewOf(Materializer.mergeVersioned(
        applied, toDf(second), "k", rowSchema)) == expect, s"replay: $evs")
      // replay the FIRST (now stale) batch → no regression
      assert(viewOf(Materializer.mergeVersioned(
        applied, toDf(first), "k", rowSchema)) == expect, s"stale: $evs")
    }
  }
}
