package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity

/** Round-13: regression specs for the round-12 advice items — the
  * zero-row index build, the append-retry exactly-once contract, and
  * the degenerate-batch guards around the csums fold state. */
class Round13OpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def seed = Seq(
    (0L, "a", Array(1.0f, 0.1f, 0.0f, 0.0f)),
    (1L, "a", Array(1.0f, 0.2f, 0.0f, 0.0f)),
    (2L, "b", Array(0.1f, 1.0f, 0.0f, 0.0f)))
    .toDF("vec_id", "label", "embedding")

  private def batch1 = Seq(
    (3L, "b", Array(0.2f, 1.0f, 0.0f, 0.0f)),
    (4L, "c", Array(0.0f, 0.0f, 1.0f, 0.1f)))
    .toDF("vec_id", "label", "embedding")

  private def probes = Seq(
    (100L, Array(0.1f, 1.0f, 0.0f, 0.0f)),
    (200L, Array(0.0f, 0.0f, 1.0f, 0.05f)))
    .toDF("probe_id", "__pv")

  private def probeRows(path: String) =
    Similarity.ivfKnnJoinIndexed(spark, path, probes,
      "vec_id", "embedding", "label", k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet

  test("buildIvfIndex over an empty frame completes; probes work; append converges") {
    val idx = Files.createTempDirectory("graft-r13-eb").toString + "/idx"
    Similarity.buildIvfIndex(seed.limit(0), "vec_id", "embedding",
      "label", idx, dims = 4)
    // centers must be READABLE (schema-carrying zero-row file), so the
    // probe path returns empty instead of crashing schema inference
    assert(spark.read.parquet(s"$idx/centers").isEmpty)
    assert(probeRows(idx).isEmpty)
    // first real append onto the empty index: falls back to the rebuild
    // (no csums data) and converges to a fresh build over the batch
    Similarity.appendToIvfIndex(spark, idx, batch1, "vec_id",
      "embedding", "label", dims = 4)
    val fresh = Files.createTempDirectory("graft-r13-eb-r").toString
    Similarity.buildIvfIndex(batch1, "vec_id", "embedding", "label",
      fresh, dims = 4)
    val got = probeRows(idx)
    assert(got.nonEmpty && got == probeRows(fresh))
  }

  test("append retry after a crash lands the batch exactly once") {
    val idx = Files.createTempDirectory("graft-r13-rt").toString + "/idx"
    Similarity.buildIvfIndex(seed, "vec_id", "embedding", "label", idx,
      dims = 4)
    assert(Similarity.appendToIvfIndex(spark, idx, batch1, "vec_id",
      "embedding", "label", dims = 4), "monotone append takes fast path")
    // crash window: renames done, marker not yet rewritten → the
    // documented repair is to RE-RUN the append with the same batch
    Similarity.deleteCsumsMarker(spark, idx)
    Similarity.appendToIvfIndex(spark, idx, batch1, "vec_id",
      "embedding", "label", dims = 4)
    val lists = spark.read.parquet(s"$idx/lists")
    assert(lists.count() == 5,
      "retry must replace the batch's files, not land them twice")
    assert(lists.groupBy("vec_id").count().filter(col("count") > 1)
      .isEmpty, "unique-id contract violated by the retry")
    val rebuilt = Files.createTempDirectory("graft-r13-rt-r").toString
    Similarity.buildIvfIndex(seed.unionByName(batch1), "vec_id",
      "embedding", "label", rebuilt, dims = 4)
    assert(probeRows(idx) == probeRows(rebuilt))
  }

  test("append retry converges from a MID-RENAME crash (partial batch on disk)") {
    val idx = Files.createTempDirectory("graft-r13-mr").toString + "/idx"
    Similarity.buildIvfIndex(seed, "vec_id", "embedding", "label", idx,
      dims = 4)
    Similarity.appendToIvfIndex(spark, idx, batch1, "vec_id",
      "embedding", "label", dims = 4)
    // simulate the crash having renamed only SOME of the batch's files:
    // drop one landed append file and the marker (the marker is always
    // absent in this window — it was deleted before the staged write)
    val landed = new java.io.File(s"$idx/lists").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(f => f.getName.startsWith("append-") &&
        f.getName.endsWith(".parquet"))
    assert(landed.length >= 2, "fixture needs >= 2 batch files")
    assert(landed.head.delete())
    Similarity.deleteCsumsMarker(spark, idx)
    Similarity.appendToIvfIndex(spark, idx, batch1, "vec_id",
      "embedding", "label", dims = 4)
    val lists = spark.read.parquet(s"$idx/lists")
    assert(lists.count() == 5 &&
      lists.groupBy("vec_id").count().filter(col("count") > 1).isEmpty,
      "retry over a partial append must land each row exactly once")
    val rebuilt = Files.createTempDirectory("graft-r13-mr-r").toString
    Similarity.buildIvfIndex(seed.unionByName(batch1), "vec_id",
      "embedding", "label", rebuilt, dims = 4)
    assert(probeRows(idx) == probeRows(rebuilt))
  }
}
