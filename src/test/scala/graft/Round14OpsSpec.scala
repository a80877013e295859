package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity
import graft.functions.Similarity.IvfDriftStats

/** Round-14: regression specs for the round-13 advice items and the
  * round's new lifecycle machinery. */
class Round14OpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("ivfDriftStats reports zero stats on an empty-but-present csums " +
    "store instead of NPEing") {
    val dir = Files.createTempDirectory("graft_ivf_empty").toString
    // a zero-row schema-carrying parquet file passes hasCsumsData (the
    // file exists) but leaves every aggregate null
    spark.range(0)
      .selectExpr("CAST(id AS STRING) AS cell", "id AS __chunk",
        "CAST(array() AS array<double>) AS __psums", "id AS __n")
      .coalesce(1).write.parquet(s"$dir/csums")
    val st = Similarity.ivfDriftStats(spark, dir, "vec_id", "embedding",
      "cell", dims = 4)
    assert(st == IvfDriftStats(0L, 0L, 0.0, 0.0))
  }
}
