package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity

/** Bit-parity of the csums ARRAY-fold centroid path (`csumsOf` →
  * `centersFromCsums`, now also the k-means / PQ-train update via
  * `cellCentersFixedWidth`) against the scalar posexplode pipeline
  * (`centroidComponents` → `centersFromComponents`, still the
  * `cellCenters` spec for non-width-guaranteed frames). Per position the
  * two run the same id-ordered inner fold, the same chunk-ordered outer
  * fold, and the same `/ n` — so on FIXED-WIDTH frames (the IVF index
  * contract) every center must match to the last bit, including NaN
  * poisoning and null-element poisoning. */
class CentroidParitySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val exposed = Similarity.getClass.getDeclaredMethods
  private def call(name: String, args: AnyRef*) = {
    val m = exposed.filter(_.getName == name)
      .minBy(_.getParameterCount != args.length)
    m.setAccessible(true)
    m.invoke(Similarity, args: _*).asInstanceOf[org.apache.spark.sql.DataFrame]
  }
  private def scalarCenters(df: org.apache.spark.sql.DataFrame,
                            dims: Int) =
    call("cellCenters", df, "label", "vec_id", "embedding",
      Integer.valueOf(dims))
  private def arrayCenters(df: org.apache.spark.sql.DataFrame,
                           dims: Int) =
    call("cellCentersFixedWidth", df, "label", "vec_id", "embedding",
      Integer.valueOf(dims))

  private def assertParity(df: org.apache.spark.sql.DataFrame,
                           dims: Int): Unit = {
    val s = scalarCenters(df, dims).collect()
      .map(r => r.get(0).toString -> r.getSeq[Double](1).map(d =>
        java.lang.Double.doubleToRawLongBits(d))).toMap
    val a = arrayCenters(df, dims).collect()
      .map(r => r.get(0).toString -> r.getSeq[Double](1).map(d =>
        java.lang.Double.doubleToRawLongBits(d))).toMap
    assert(a.keySet === s.keySet)
    for ((k, sv) <- s)
      assert(a(k) === sv, s"cell $k: array-fold bits != scalar bits")
  }

  test("random fixed-width frames: array-fold centers == scalar centers, raw bits") {
    val rnd = new scala.util.Random(11)
    for (dims <- Seq(4, 64)) {
      val rows = (0 until 500).map { i =>
        (i.toLong, s"c${rnd.nextInt(7)}",
          Array.fill(dims)(rnd.nextGaussian().toFloat))
      }
      assertParity(rows.toDF("vec_id", "label", "embedding"), dims)
    }
  }

  test("NaN elements poison the same positions in both forms") {
    val rows = Seq(
      (0L, "a", Array(1.0f, Float.NaN, 3.0f, 4.0f)),
      (1L, "a", Array(2.0f, 1.0f, 1.0f, 1.0f)),
      (2L, "b", Array(Float.NaN, Float.NaN, 0.0f, 0.0f)))
    assertParity(rows.toDF("vec_id", "label", "embedding"), 4)
  }

  test("null vectors are excluded identically; single-row cells match") {
    val rows = Seq(
      (0L, "a", Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, "a", null.asInstanceOf[Array[Float]]),
      (2L, "b", Array(0.5f, 0.5f, 0.5f, 0.5f)))
    assertParity(rows.toDF("vec_id", "label", "embedding"), 4)
  }

  test("wider-than-dims vectors slice/filter identically") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 100).map { i =>
      (i.toLong, s"c${rnd.nextInt(3)}",
        Array.fill(10)(rnd.nextGaussian().toFloat))
    }
    assertParity(rows.toDF("vec_id", "label", "embedding"), 4)
  }
}
