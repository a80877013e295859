package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** Round-11: incremental repeated-line maintenance — mid-stream
  * promotion, crash-replay identity, bounded state reads, frozen-key
  * composition, and the e2e prep-pipeline wiring. */
class Round11LineSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val boiler = "subscribe to our newsletter for the best daily updates"
  private val banner = "all rights reserved by the example publishing house"

  private def doc(id: Long, lines: String*): (Long, String) =
    (id, lines.mkString("\n"))

  private def strip(st: String, batch: DataFrame, id: Long,
                    frozen: Option[DataFrame] = None): Map[Long, (String, Long)] =
    StreamOps.lineStateEpoch(batch, id, st, "doc_id", "text", frozen)
      .select("doc_id", "text", "n_lines_removed").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("a line crossing minDocs mid-stream is stripped from later batches only") {
    val st = Files.createTempDirectory("graft-ls-a").toString + "/ls"
    // epoch 0: the boilerplate line appears in TWO docs → promoted AT 0,
    // but epoch 0's own docs keep it (promotion strips later batches)
    val e0 = Seq(
      doc(1, "a genuinely unique first sentence here", boiler),
      doc(2, boiler, "a different second document body line"),
      doc(3, "nothing repeated in this third document")).toDF("doc_id", "text")
    val r0 = strip(st, e0, 0L)
    assert(r0(1)._1.contains(boiler) && r0(2)._1.contains(boiler),
      "the promoting epoch must keep its own text")
    assert(r0.values.forall(_._2 == 0L))
    // epoch 1: a new doc carrying the promoted line has it stripped
    val e1 = Seq(
      doc(10, "fresh unrelated content for the next epoch", boiler),
      doc(11, "and one doc with nothing repeated at all")).toDF("doc_id", "text")
    val r1 = strip(st, e1, 1L)
    assert(!r1(10)._1.contains(boiler) && r1(10)._2 == 1L,
      s"promoted line must be stripped: ${r1(10)}")
    assert(r1(11)._2 == 0L)
  }

  test("counts accumulate ACROSS epochs: one doc each in two epochs promotes") {
    val st = Files.createTempDirectory("graft-ls-b").toString + "/ls"
    val e0 = Seq(doc(1, banner, "unique first epoch content line one"))
      .toDF("doc_id", "text")
    val r0 = strip(st, e0, 0L)
    assert(r0(1)._1.contains(banner), "one doc is below minDocs")
    // second sighting in a DIFFERENT epoch crosses minDocs = 2
    val e1 = Seq(doc(2, "unique second epoch content line two", banner))
      .toDF("doc_id", "text")
    val r1 = strip(st, e1, 1L)
    assert(r1(2)._1.contains(banner),
      "the crossing epoch keeps its own text")
    // and from epoch 2 on the line is gone
    val e2 = Seq(doc(3, banner, "third epoch document body text here"))
      .toDF("doc_id", "text")
    val r2 = strip(st, e2, 2L)
    assert(!r2(3)._1.contains(banner) && r2(3)._2 == 1L, s"${r2(3)}")
  }

  test("crash-replayed epoch: same strip, same promotions, same counts") {
    val st = Files.createTempDirectory("graft-ls-c").toString + "/ls"
    strip(st, Seq(
      doc(1, boiler, "epoch zero first doc unique line"),
      doc(2, boiler, "epoch zero second doc unique line")).toDF("doc_id", "text"), 0L)
    val e1 = Seq(
      doc(10, boiler, banner, "epoch one doc ten body"),
      doc(11, banner, "epoch one doc eleven body text")).toDF("doc_id", "text")
    def stateRows(t: String) = spark.read.parquet(s"$st/$t")
      .collect().map(_.toString).sorted.toSeq
    val r1a = strip(st, e1, 1L)
    val (c1, p1) = (stateRows("counts"), stateRows("promoted"))
    val r1b = strip(st, e1, 1L) // the replay
    assert(r1a == r1b, "replayed strip diverged")
    assert(stateRows("counts") == c1 && stateRows("promoted") == p1,
      "replayed state diverged")
    // banner crossed minDocs at epoch 1 (docs 10+11) → epoch 2 strips it
    val r2 = strip(st, Seq(doc(20, banner, "epoch two body")).toDF("doc_id", "text"), 2L)
    assert(!r2(20)._1.contains(banner))
  }

  test("frozen keys compose: frozen boilerplate never counted, still stripped") {
    val st = Files.createTempDirectory("graft-ls-d").toString + "/ls"
    val frozen = graft.functions.Dedup.repeatedLineKeys(
      Seq(doc(100, boiler, "x"), doc(101, boiler, "y")).toDF("doc_id", "text"),
      "doc_id", "text", minDocs = 2, minLineChars = 10)
    val e0 = Seq(
      doc(1, boiler, "some unique body line for doc one"),
      doc(2, boiler, "some unique body line for doc two")).toDF("doc_id", "text")
    val r0 = strip(st, e0, 0L, Some(frozen))
    // frozen keys strip IMMEDIATELY (not promotion semantics)
    assert(!r0(1)._1.contains(boiler) && !r0(2)._1.contains(boiler))
    // and the stripped line never entered the counts state
    val counts = spark.read.parquet(s"$st/counts")
    assert(spark.createDataFrame(Seq(Tuple1(boiler))).toDF("l")
      .select(graft.functions.Dedup.hash60(col("l")).as("k"))
      .join(counts, col("k") === col("__lk")).count() == 0,
      "frozen-stripped lines must not be counted")
  }

  test("a batch sharing no lines with the state reads ~zero counts bytes") {
    val st = Files.createTempDirectory("graft-ls-e").toString + "/ls"
    // two epochs of docs with many lines (all unique)
    def corpus(base: Int, n: Int) = (1 to n).map(i =>
      doc(base + i, (1 to 20).map(j =>
        s"corpus line $base $i $j with enough characters").toArray: _*))
      .toDF("doc_id", "text")
    strip(st, corpus(1000, 40), 0L)
    strip(st, corpus(2000, 40), 1L)
    val stB = Files.createTempDirectory("graft-ls-eb").toString + "/ls"
    // arm B: same state without summaries → conservative full read
    import java.nio.file.{Files => JF, Path, Paths}
    val src = Paths.get(st); val dst = Paths.get(stB)
    JF.walk(src).forEach { p: Path =>
      val t = dst.resolve(src.relativize(p))
      if (JF.isDirectory(p)) JF.createDirectories(t) else JF.copy(p, t)
    }
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(s"$stB/linesum"))
    graft.streaming.KeySummaries.invalidate(stB)
    val fresh = Seq(
      doc(9001, (1 to 20).map(j => s"entirely new batch line $j content").toArray: _*))
      .toDF("doc_id", "text")
    def fileBytes(): Long =
      Option(org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics
        .get("file"))
        .flatMap(s => Option(s.getLong("bytesRead")).map(_.longValue()))
        .getOrElse(0L)
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p))
    }
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("parquet.hadoop.vectored.io.enabled", "false")
    val (withSum, noSum) = try {
      val b0 = fileBytes()
      strip(st, fresh, 2L)
      val w = fileBytes() - b0
      val b1 = fileBytes()
      strip(stB, fresh, 2L)
      (w, fileBytes() - b1)
    } finally hc.unset("parquet.hadoop.vectored.io.enabled")
    val countsBytes = dirBytes(s"$stB/counts")
    assert(noSum - withSum > (countsBytes * 0.3).toLong,
      s"summary pruning saved too little: withSum=$withSum noSum=$noSum " +
        s"counts=$countsBytes")
  }

  test("e2e prepPipelineTo with lineState: mid-stream boilerplate stripped") {
    val in = Files.createTempDirectory("graft-ls-f").toString
    val body0 = "the quick brown fox jumps over the lazy dog in the meadow " +
      "while birds sing their morning songs across the quiet valley"
    val body1 = "a completely different tale of rivers and bridges where " +
      "the miller waits for morning light to cross the old stone arch"
    val body2 = "yet another story entirely about mountains and snowfall " +
      "where climbers rest beneath the ridge before the final ascent"
    Seq((1L, s"$body0\n$boiler"), (2L, s"$boiler\n$body1"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    Thread.sleep(1100)
    Seq((3L, s"$body2\n$boiler")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    val out = Files.createTempDirectory("graft-ls-fo").toString + "/out"
    val stDedup = Files.createTempDirectory("graft-ls-fd").toString + "/st"
    val stLines = Files.createTempDirectory("graft-ls-fl").toString + "/ls"
    val schema = Seq((1L, "x")).toDF("doc_id", "text").schema
    StreamOps.prepPipelineTo(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(in),
      Seq.empty[(String)].toDF("text"), out, stDedup,
      Files.createTempDirectory("graft-ls-fc").toString,
      "doc_id", "text", minJaccard = 0.8, minQuality = 0.0,
      lineState = Some(stLines)).awaitTermination()
    val docsOut = spark.read.parquet(s"$out/docs")
      .select("doc_id", "text", "n_lines_removed").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // batch 0 promoted the boilerplate (2 docs) and keeps its text;
    // batch 1's doc arrives with it STRIPPED before dedup/quality
    assert(docsOut(1)._1.contains(boiler) && docsOut(2)._1.contains(boiler))
    assert(!docsOut(3)._1.contains(boiler) && docsOut(3)._2 == 1L,
      s"doc 3: ${docsOut(3)}")
  }
}
