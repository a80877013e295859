package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bloom
import graft.operators.TimeSeries

/**
 * Property obligations for the round-5 operators, against reference
 * implementations in plain Scala:
 *  - resample conserves counts/sums and emits a contiguous spine;
 *  - rollingStats equals the naive trailing-window fold at every row;
 *  - Bloom membership never false-negatives, for ANY key set.
 */
class TimeSeriesProperties extends AnyFunSuite {
  import SparkTestSession._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    PropertySamples.samples(g, n, 1042L)

  private val tsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      // negative timestamps included on purpose: floor-bucket semantics
      t <- Gen.choose(-500L, 500L)
      v <- Gen.choose(-20L, 20L)
    } yield (t, v))
  } yield rows

  test("property: resample conserves counts and sums, spine is contiguous") {
    import spark.implicits._
    samples(tsGen, 8).foreach { rows =>
      val every = 10L
      val got = TimeSeries.resample(rows.toDF("ts_us", "v"), col("ts_us"),
        every, Seq(count(lit(1)).as("n"), sum(col("v")).as("s")))
        .orderBy("bucket_us").collect()
      val buckets = got.map(_.getLong(0)).toSeq
      assert(buckets == (buckets.head to buckets.last by every).toSeq,
        "spine has holes or wrong step")
      val floor = (t: Long) => t - java.lang.Math.floorMod(t, every)
      assert(buckets.head == rows.map(r => floor(r._1)).min)
      assert(buckets.last == rows.map(r => floor(r._1)).max)
      assert(got.map(r => if (r.isNullAt(1)) 0L else r.getLong(1)).sum ==
        rows.length, "row count not conserved")
      assert(got.map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).sum ==
        rows.map(_._2).sum, "value sum not conserved")
    }
  }

  test("property: rollingStats equals the naive trailing-window fold") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        key <- Gen.choose(0L, 2L)
        v <- Gen.choose(-9L, 9L)
      } yield (key, v))
    } yield rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
    samples(gen, 8).foreach { rows =>
      val w = 3
      val got = TimeSeries.rollingStats(rows.toDF("id", "key", "v"),
        Seq(col("key")), Seq(col("id")), col("v"), w)
        .select("id", "roll_n", "roll_sum").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      rows.groupBy(_._2).foreach { case (_, ks) =>
        val ordered = ks.sortBy(_._1)
        ordered.zipWithIndex.foreach { case ((id, _, _), i) =>
          val frame = ordered.slice(math.max(0, i - w + 1), i + 1)
          assert(got(id) == ((frame.length.toLong,
            frame.map(_._3).sum.toDouble)), s"row $id frame mismatch")
        }
      }
    }
  }

  test("property: bloom never false-negatives on any key set") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 80)
      keys <- Gen.listOfN(n, Gen.identifier.map(_.take(12)))
    } yield keys.distinct
    samples(gen, 6).foreach { keys =>
      val (m, k) = Bloom.sizeFor(keys.length.toLong, 0.01)
      val flagged = Bloom.flagMembers(keys.toDF("k"), col("k"),
        keys.toDF("k"), col("k"), m, k)
      assert(flagged.filter(!col("bloom_hit")).count() == 0L,
        "a true member was not flagged")
    }
  }
}
