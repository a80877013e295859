package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, ShingleHash, Similarity, TextFns}

/** Round-9 second-review fixes: the Jaccard hash-bound's degenerate
  * denominator, the footer-based centers count behind the auto probe
  * default, and the shared auto-crossover rule. */
class Round9ReviewSpec extends AnyFunSuite {
  import SparkTestSession._

  // ---- Jaccard bound: within-doc 28-bit collision cannot zero the ----
  // ---- denominator or drop a true duplicate                       ----

  // "x16529 b c y5471" was searched offline so that its two DISTINCT
  // trigram shingles "x16529 b c" and "b c y5471" share the md5-28
  // prefix 0xef66a18 — the hash-join match count c then counts each
  // cross match (c = 4 > na = nb = 2), and the raw bound c/(na+nb-c)
  // divides by zero (ANSI: job-killing DIVIDE_BY_ZERO; non-ANSI: the
  // exact-jac-1.0 pair silently dropped).
  private val collidingText = "x16529 b c y5471"

  test("premise: the fixture doc's two distinct shingles collide at 28 bits") {
    import spark.implicits._
    val row = Seq(collidingText).toDF("text")
      .select(ShingleHash.h28(col("text")).as("hs"),
        TextFns.shingles(col("text")).as("ss"))
      .collect()(0)
    val hs = row.getSeq[Long](0)
    val ss = row.getSeq[String](1)
    assert(ss.length == 2 && ss(0) != ss(1),
      s"fixture must hold two distinct shingle strings: $ss")
    assert(hs.length == 2 && hs(0) == hs(1),
      s"fixture shingles must collide at 28 bits: $hs")
  }

  test("ngramJaccard survives the colliding doc pair and keeps it at jac 1.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, collidingText),
      (2L, collidingText),
      (3L, "totally unrelated filler words that shingle elsewhere entirely"))
      .toDF("doc_id", "text")
    val out = Dedup.ngramJaccard(docs, "doc_id", "text",
      minJaccard = 0.8, minShared = 2).collect()
    assert(out.length == 1, s"exactly the colliding pair: ${out.toSeq}")
    val r = out(0)
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(r.getDouble(2) == 1.0)
  }

  // ---- footer-based parquet row count (the auto default's K probe) ----

  test("parquetRowCount matches count() across a multi-file table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-prc").toString + "/t"
    (1 to 1000).toDF("x").repartition(3).write.parquet(dir)
    assert(Similarity.parquetRowCount(spark, dir) == 1000L)
    // hidden files are invisible to spark.read.parquet and must be
    // invisible to the footer count too, or a stray staged copy would
    // flip the auto probe plan on a small index
    val d = new java.io.File(dir)
    val part = d.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(d, "_stray.parquet").toPath)
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(d, ".hidden.parquet").toPath)
    assert(Similarity.parquetRowCount(spark, dir) == 1000L,
      "hidden '_'/'.' files must not count")
  }

  test("parquetRowCount falls back to count() on layout drift") {
    import spark.implicits._
    // a value-PARTITIONED tree: data lives in subdirectories, so the
    // footer shortcut sees no top-level .parquet files — the round-9
    // form silently returned 0 here (flipping the auto probe plan);
    // now it must pay the count() job and stay correct
    val dir = Files.createTempDirectory("graft-prcp").toString + "/t"
    (1 to 100).map(i => (i, i % 4)).toDF("x", "p")
      .write.partitionBy("p").parquet(dir)
    assert(Similarity.parquetRowCount(spark, dir) == 100L,
      "partitioned layout must fall back to a correct count, not 0")
    // a flat tree whose files lack the .parquet suffix: same fallback
    val dir2 = Files.createTempDirectory("graft-prcs").toString + "/t"
    (1 to 50).toDF("x").coalesce(1).write.parquet(dir2)
    val d2 = new java.io.File(dir2)
    for (f <- d2.listFiles() if f.getName.endsWith(".parquet")) {
      assert(f.renameTo(new java.io.File(d2,
        f.getName.stripSuffix(".parquet"))))
      // drop the checksum sidecar so the renamed file still reads
      new java.io.File(d2, "." + f.getName + ".crc").delete()
    }
    assert(Similarity.parquetRowCount(spark, dir2) == 50L,
      "suffix drift must fall back to a correct count, not 0")
    // a dir holding only hidden files (or nothing) is 0 rows — the old
    // footer sum said 0 and spark.read would CRASH on schema inference,
    // so the fallback must not be taken here
    val dir3 = Files.createTempDirectory("graft-prce").toString + "/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir3))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir3, "_SUCCESS"), Array.emptyByteArray)
    assert(Similarity.parquetRowCount(spark, dir3) == 0L,
      "hidden-only dir must count 0, not crash")
  }

  // ---- line-level boilerplate removal ----

  test("dedupLines strips cross-doc lines, keeps order, short lines, singles") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter today"
    val legal = "all rights reserved by the publisher"
    val docs = Seq(
      (1L, s"$boiler\nunique first content line\n--\n$legal"),
      (2L, s"another document body here\n$boiler\n--"),
      // doc 3 is ENTIRELY boilerplate → rewritten to empty, still a row
      (3L, s"$boiler\n$legal"),
      // doc 4 repeats the boilerplate line twice WITHIN itself: both
      // occurrences stripped, but its within-doc repetition alone (one
      // distinct doc) would never mark a line as boilerplate
      (4L, s"$boiler\nmiddle matter stays\n$boiler"),
      (5L, "wholly unrelated single document"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, "doc_id", "text",
      minDocs = 2, minLineChars = 10)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    // boiler is in docs 1,2,3,4 and legal in docs 1,3 → both boilerplate;
    // "--" is in 2 docs but under minLineChars → kept (structure)
    assert(out(1L) == ("unique first content line\n--", 2L), out(1L))
    assert(out(2L) == (s"another document body here\n--", 1L))
    assert(out(3L) == ("", 2L), "all-boilerplate doc → empty, counted")
    assert(out(4L) == ("middle matter stays", 2L),
      "both in-doc occurrences of a corpus-duplicated line are stripped")
    assert(out(5L) == ("wholly unrelated single document", 0L))
    assert(out.size == 5)
  }

  test("dedupLinesByHash ≡ dedupLines on a collision-free corpus") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter today"
    val docs = Seq(
      (1L, s"$boiler\nunique first content line"),
      (2L, s"second document body\n$boiler"),
      (3L, "standalone third document text"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val exact = rows(Dedup.dedupLines(docs, "doc_id", "text", 2, 10))
    val hashed = rows(Dedup.dedupLinesByHash(docs, "doc_id", "text", 2, 10))
    assert(exact == hashed && exact.exists(_._3 == 1L),
      s"exact=$exact hashed=$hashed")
  }

  // ---- the driver's flagship smoke ----

  test("SparkEntry.entry returns rows (the driver's rows>0 smoke gate)") {
    // nothing else in the suite exercised entry() — a refactor could
    // break the driver's very first check without failing a test
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // ---- the single auto-crossover rule ----

  test("resolveSuperProbe: explicit pins win; auto engages past K > 2^bits*4") {
    // explicit values are passed through untouched — the contract rows'
    // pinned-flat promise and the explicit-width form
    assert(Similarity.resolveSuperProbe(1000L, 0, 4) == 0)
    assert(Similarity.resolveSuperProbe(10L, 7, 4) == 7)
    // auto: flat at or below the crossover, width 2^bits/4 beyond it
    assert(Similarity.resolveSuperProbe(64L, -1, 4) == 0)
    assert(Similarity.resolveSuperProbe(65L, -1, 4) == 4)
    assert(Similarity.resolveSuperProbe(10L, -1, 4) == 0)
    // degenerate small superBits still yields a positive width
    assert(Similarity.resolveSuperProbe(100L, -1, 1) == 1)
  }
}
