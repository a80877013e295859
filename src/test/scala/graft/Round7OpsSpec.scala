package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity

/** Round-7 operators: the deterministic k-means coarse quantizer and the
  * SemDeDup cell-bounded recall telemetry. */
class Round7OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Two well-separated clusters on axes 0 and 1 plus one zero vector. */
  private def clustered: DataFrame = {
    import spark.implicits._
    val rows =
      (1L to 6L).map(i => (i, Array(10.0 + i, 1.0, 0.0, 0.0))) ++
        (11L to 16L).map(i => (i, Array(1.0, 10.0 + i, 0.0, 0.0))) ++
        Seq((99L, Array(0.0, 0.0, 0.0, 0.0)))
    rows.toDF("vec_id", "embedding")
  }

  test("kmeansLabels separates obvious clusters; zero-norm gets cell -1") {
    val labels = Similarity
      .kmeansLabels(clustered, "vec_id", "embedding", k = 2, iters = 2,
        dims = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = (1L to 6L).map(labels)
    val b = (11L to 16L).map(labels)
    assert(a.distinct.size == 1, s"cluster A split: $a")
    assert(b.distinct.size == 1, s"cluster B split: $b")
    assert(a.head != b.head, "clusters merged")
    assert(Set(a.head, b.head) == Set(0, 1), "cells must be 0..k-1")
    assert(labels(99L) == -1, "zero-norm vector must get cell -1")
  }

  test("kmeansLabels is layout-free: repartitioned input, identical cells") {
    val base = clustered
    def run(df: DataFrame) = Similarity
      .kmeansLabels(df, "vec_id", "embedding", k = 3, iters = 2, dims = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(run(base.repartition(7, col("vec_id"))) ==
      run(base.repartition(1).sortWithinPartitions(col("vec_id").desc)))
  }

  test("kmeansLabels sampled training labels EVERY vector, clusters intact") {
    // trainMod=2 trains on the md5-hash half but the final assignment
    // covers the full corpus — nothing unlabeled, separation preserved
    val labels = Similarity
      .kmeansLabels(clustered, "vec_id", "embedding", k = 2, iters = 2,
        dims = 4, trainMod = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(labels.size == 13, s"every vector labeled: ${labels.size}")
    val a = (1L to 6L).map(labels)
    val b = (11L to 16L).map(labels)
    assert(a.distinct.size == 1 && b.distinct.size == 1 && a.head != b.head)
    assert(labels(99L) == -1)
  }

  test("kmeansLabels k=1 puts every nonzero vector in cell 0") {
    val labels = Similarity
      .kmeansLabels(clustered, "vec_id", "embedding", k = 1, iters = 1,
        dims = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert((1L to 6L).forall(labels(_) == 0))
    assert((11L to 16L).forall(labels(_) == 0))
    assert(labels(99L) == -1)
  }

  test("kmeansLabels cells drive ivfKnnJoin to exact recall on separable data") {
    import spark.implicits._
    val base = clustered.filter(col("vec_id") =!= 99L)
    val labeled = base.join(
      Similarity.kmeansLabels(base, "vec_id", "embedding", k = 2, iters = 2,
        dims = 4), Seq("vec_id"))
    val probes = Seq((1L, Array(13.0, 1.0, 0.0, 0.0)),
      (11L, Array(1.0, 13.0, 0.0, 0.0)))
      .toDF("probe_id", "__pv")
    // nProbe=1: a good quantizer routes each probe to its own cluster and
    // within-cluster exact scoring equals global brute force
    val ivf = Similarity.ivfKnnJoin(labeled, probes, "vec_id", "embedding",
      "cell", k = 3, nProbe = 1, dims = 4)
    val bf = Similarity.knnJoinWith(base, probes, "vec_id", "embedding",
      k = 3, excludeSelf = true)
    val rec = Similarity.recallAtK(ivf, bf).collect()
    assert(rec.length == 2)
    assert(rec.forall(_.getAs[Double]("recall") == 1.0),
      s"separable data must give recall 1.0: ${rec.mkString(",")}")
  }

  test("semDedupRecall counts exact pairs vs within-cell pairs") {
    import spark.implicits._
    // a~b near-dup same cell, c~d near-dup SPLIT across cells, e isolated
    val sample = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0), 0),
      (2L, Array(0.99, 0.01, 0.0, 0.0), 0),
      (3L, Array(0.0, 1.0, 0.0, 0.0), 1),
      (4L, Array(0.01, 0.99, 0.0, 0.0), 2),
      (5L, Array(0.0, 0.0, 1.0, 0.0), 1))
      .toDF("vec_id", "embedding", "cell")
    val r = Similarity
      .semDedupRecall(sample, "vec_id", "embedding", "cell", 0.9, "toy")
      .collect().head
    assert(r.getAs[String]("quantizer") == "toy")
    assert(r.getAs[Long]("n_pairs") == 2, "pairs (1,2) and (3,4)")
    assert(r.getAs[Long]("n_within_cell") == 1, "only (1,2) share a cell")
    assert(r.getAs[Double]("recall") == 0.5)
  }

  test("semDedupRecall with no qualifying pairs reports recall 1.0") {
    import spark.implicits._
    val sample = Seq(
      (1L, Array(1.0, 0.0), 0),
      (2L, Array(0.0, 1.0), 0),
      (3L, Array(0.0, 0.0), 1)) // zero-norm: filtered, never NaN-pairs
      .toDF("vec_id", "embedding", "cell")
    val r = Similarity
      .semDedupRecall(sample, "vec_id", "embedding", "cell", 0.9, "empty")
      .collect().head
    assert(r.getAs[Long]("n_pairs") == 0)
    assert(r.getAs[Long]("n_within_cell") == 0)
    assert(r.getAs[Double]("recall") == 1.0)
  }

  // ---- incremental index maintenance ----

  private def dedupCorpus = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "completely different text about spark query planning rules"))
      .toDF("doc_id", "text")
  }
  private def dedupBatch2 = {
    import spark.implicits._
    Seq(
      (3L, "another unrelated document mentioning parquet column pruning"),
      (4L, "the quick brown fox jumps over the lazy dog again tonight"))
      .toDF("doc_id", "text")
  }
  private def dedupProbe = {
    import spark.implicits._
    Seq(
      // near-dup of appended doc 4 (must be caught ONLY via the append)
      (10L, "a quick brown fox jumps over the lazy dog again tonight"),
      (11L, "entirely fresh content that matches nothing in the corpus"))
      .toDF("doc_id", "text")
  }
  private def dedupRows(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), Option(r.get(1)), r.getBoolean(3))).toSet

  test("appendToDedupIndex: append-then-probe equals rebuild-then-probe") {
    import graft.functions.Dedup
    val appended = java.nio.file.Files
      .createTempDirectory("graft-dedup-app").toString
    Dedup.buildDedupIndex(dedupCorpus, "doc_id", "text", appended)
    Dedup.appendToDedupIndex(dedupBatch2, "doc_id", "text", appended)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-dedup-reb").toString
    Dedup.buildDedupIndex(dedupCorpus.unionByName(dedupBatch2),
      "doc_id", "text", rebuilt)
    val a = dedupRows(Dedup.dedupAgainstIndexed(
      spark, appended, dedupProbe, "doc_id", "text", 0.5))
    val b = dedupRows(Dedup.dedupAgainstIndexed(
      spark, rebuilt, dedupProbe, "doc_id", "text", 0.5))
    assert(a == b)
    assert(a.exists { case (id, dup, adm) =>
      id == 10L && dup.contains(4L) && !adm },
      "probe must match the APPENDED doc 4")
    assert(a.contains((11L, None, true)))
  }

  test("compactDedupIndex shrinks files, probe results unchanged") {
    import graft.functions.Dedup
    val path = java.nio.file.Files
      .createTempDirectory("graft-dedup-cpt").toString
    Dedup.buildDedupIndex(dedupCorpus, "doc_id", "text", path)
    Dedup.appendToDedupIndex(dedupBatch2, "doc_id", "text", path)
    val before = dedupRows(Dedup.dedupAgainstIndexed(
      spark, path, dedupProbe, "doc_id", "text", 0.5))
    def nFiles(t: String) = new java.io.File(s"$path/$t").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val filesBefore = nFiles("sets")
    val counts = Dedup.compactDedupIndex(spark, path, targetFiles = 1)
    assert(counts("sets") == 4 && counts("keys") > 0)
    assert(nFiles("sets") == 1 && nFiles("sets") < filesBefore)
    val after = dedupRows(Dedup.dedupAgainstIndexed(
      spark, path, dedupProbe, "doc_id", "text", 0.5))
    assert(after == before)
  }

  private def ivfCorpus = {
    import spark.implicits._
    Seq(
      (0L, "a", Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (1L, "a", Array(1.0f, 0.2f, 0.0f, 0.0f)),
      (2L, "b", Array(0.1f, 1.0f, 0.0f, 0.0f)),
      (3L, "b", Array(0.2f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
  }
  private def ivfBatch2 = {
    import spark.implicits._
    Seq(
      // grows cell b and introduces a NEW cell c — the append must both
      // extend an existing partition and create a fresh one
      (4L, "b", Array(0.15f, 1.0f, 0.0f, 0.0f)),
      (5L, "c", Array(0.0f, 0.0f, 1.0f, 0.1f)),
      (6L, "c", Array(0.0f, 0.0f, 0.9f, 0.1f)))
      .toDF("vec_id", "label", "embedding")
  }
  private def ivfProbes = {
    import spark.implicits._
    Seq(
      (100L, Array(0.1f, 1.0f, 0.0f, 0.0f)),
      (200L, Array(0.0f, 0.0f, 1.0f, 0.05f)))
      .toDF("probe_id", "__pv")
  }
  private def ivfRows(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet

  test("appendToIvfIndex: append-then-probe bit-identical to rebuild") {
    val appended = java.nio.file.Files
      .createTempDirectory("graft-ivf-app").toString
    Similarity.buildIvfIndex(ivfCorpus, "vec_id", "embedding", "label",
      appended, dims = 4)
    Similarity.appendToIvfIndex(spark, appended, ivfBatch2, "vec_id",
      "embedding", "label", dims = 4)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-ivf-reb").toString
    Similarity.buildIvfIndex(ivfCorpus.unionByName(ivfBatch2), "vec_id",
      "embedding", "label", rebuilt, dims = 4)
    val a = ivfRows(Similarity.ivfKnnJoinIndexed(spark, appended, ivfProbes,
      "vec_id", "embedding", "label", k = 3, nProbe = 2))
    val b = ivfRows(Similarity.ivfKnnJoinIndexed(spark, rebuilt, ivfProbes,
      "vec_id", "embedding", "label", k = 3, nProbe = 2))
    assert(a.nonEmpty && a == b)
    // the z-probe's neighbors exist only in the appended cell c
    assert(a.exists { case (pid, _, nid, _) => pid == 200L && nid == 5L })
  }

  test("refreshIvfCenters alone repairs a crash between append halves") {
    // simulate the crash window EXACTLY as the round-12 append leaves
    // it: marker deleted FIRST, lists appended, centers/csums untouched
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivf-crash").toString
    Similarity.buildIvfIndex(ivfCorpus, "vec_id", "embedding", "label",
      path, dims = 4)
    Similarity.deleteCsumsMarker(spark, path)
    ivfBatch2.select(col("vec_id"), col("embedding"), col("label"),
        Similarity.norm(col("embedding")).as("__cn"),
        col("label").cast("string").as("__cellkey"))
      .write.mode("append").partitionBy("__cellkey")
      .parquet(s"$path/lists")
    // stale centers: no center row for cell c yet → z-probe can't see it
    val stale = spark.read.parquet(s"$path/centers")
    assert(!stale.collect().map(_.getAs[String](0)).contains("c"))
    Similarity.refreshIvfCenters(spark, path, "vec_id", "embedding",
      "label", dims = 4)
    val repaired = ivfRows(Similarity.ivfKnnJoinIndexed(spark, path,
      ivfProbes, "vec_id", "embedding", "label", k = 3, nProbe = 2))
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-ivf-reb2").toString
    Similarity.buildIvfIndex(ivfCorpus.unionByName(ivfBatch2), "vec_id",
      "embedding", "label", rebuilt, dims = 4)
    assert(repaired == ivfRows(Similarity.ivfKnnJoinIndexed(spark, rebuilt,
      ivfProbes, "vec_id", "embedding", "label", k = 3, nProbe = 2)))
  }

  test("compactIvfIndex keeps cell partitions prunable, results unchanged") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivf-cpt").toString
    Similarity.buildIvfIndex(ivfCorpus, "vec_id", "embedding", "label",
      path, dims = 4)
    Similarity.appendToIvfIndex(spark, path, ivfBatch2, "vec_id",
      "embedding", "label", dims = 4)
    val before = ivfRows(Similarity.ivfKnnJoinIndexed(spark, path,
      ivfProbes, "vec_id", "embedding", "label", k = 3, nProbe = 2))
    val n = Similarity.compactIvfIndex(spark, path)
    assert(n == 7)
    // layout preserved: one file per cell directory, pruning still works
    val bDir = new java.io.File(s"$path/lists/__cellkey=b")
    assert(bDir.isDirectory &&
      bDir.listFiles().count(_.getName.endsWith(".parquet")) == 1)
    val pruned = spark.read.parquet(s"$path/lists")
      .filter(col("__cellkey") === "b")
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in the pruned plan"))
    assert(scan.partitionFilters.exists(_.references.exists(
      _.name == "__cellkey")))
    assert(ivfRows(Similarity.ivfKnnJoinIndexed(spark, path, ivfProbes,
      "vec_id", "embedding", "label", k = 3, nProbe = 2)) == before)
  }

  test("auto superProbe (-1): few cells resolve to the flat ranking") {
    // 2 cells << 2^superBits*4: the crossover rule must pick flat, making
    // the opt-in auto bit-for-bit with an explicit superProbe = 0 (which
    // is now the library DEFAULT — auto is opt-in so default callers keep
    // the documented bit-identity with the inline form)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivf-auto").toString
    Similarity.buildIvfIndex(ivfCorpus, "vec_id", "embedding", "label",
      path, dims = 4)
    val auto = ivfRows(Similarity.ivfKnnJoinIndexed(spark, path, ivfProbes,
      "vec_id", "embedding", "label", k = 3, nProbe = 2, superProbe = -1))
    val flat = ivfRows(Similarity.ivfKnnJoinIndexed(spark, path, ivfProbes,
      "vec_id", "embedding", "label", k = 3, nProbe = 2, superProbe = 0))
    assert(auto.nonEmpty && auto == flat)
  }
}
