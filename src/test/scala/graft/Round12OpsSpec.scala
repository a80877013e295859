package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Multimodal}
import graft.streaming.StreamOps

/** Round-12: regression specs for the round-11 advice items — the
  * strictly-earlier-epoch line-state contract, the media fixtures'
  * adversarial-payload guards, and the empty half-migrated keys error. */
class Round12OpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)

  test("lineStateEpoch: replaying a LOWER-id epoch ignores later promotions") {
    val st = Files.createTempDirectory("graft-r12-ls").toString + "/ls"
    val boiler = "subscribe to our newsletter for the best daily updates"
    def doc(id: Long, lines: String*) = (id, lines.mkString("\n"))
    def strip(batch: Seq[(Long, String)], id: Long) =
      StreamOps.lineStateEpoch(batch.toDF("doc_id", "text"), id, st,
        "doc_id", "text", None)
        .select("doc_id", "text", "n_lines_removed").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val e0 = Seq(doc(1, boiler, "epoch zero unique body line one"))
    val r0a = strip(e0, 0L)
    assert(r0a(1)._1.contains(boiler), "below minDocs — kept")
    // epoch 1 crosses minDocs = 2 (prior 1 + these 1..2) → promoted AT 1
    strip(Seq(doc(10, boiler, "epoch one unique body line ten"),
      doc(11, boiler, "epoch one unique body line eleven")), 1L)
    assert(spark.read.parquet(s"$st/promoted").filter(col("batch") === 1L)
      .count() >= 1, "epoch 1 must have promoted the boilerplate")
    def batch0State(t: String) = spark.read.parquet(s"$st/$t")
      .filter(col("batch") === 0L).collect().map(_.toString).sorted.toSeq
    val (c0, p0) = (batch0State("counts"), batch0State("promoted"))
    // the replayed epoch 0 must see only batches < 0 (none): identical
    // output and identical batch-0 state, NOT a strip against epoch 1's
    // "future" promotion
    val r0b = strip(e0, 0L)
    assert(r0b == r0a, s"replayed epoch 0 diverged: $r0b vs $r0a")
    assert(r0b(1)._1.contains(boiler) && r0b(1)._2 == 0L,
      "replay stripped against a future promotion")
    assert(batch0State("counts") == c0 && batch0State("promoted") == p0,
      "replayed epoch-0 state diverged")
  }

  test("asVideoMedia rejects text/plain rows whose bytes parse as MP4") {
    // an all-ASCII MP4 container round-trips String <-> UTF-8 exactly,
    // so adversarial "text" CAN be a structurally valid container
    val mp4 = Multimodal.VideoHeader.mp4Bytes("isom", timescale = 600,
      duration = 100L, w = 64, h = 48, v1 = false,
      payload = "x".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    assume(mp4.forall(_ >= 0), "fixture bytes must all be ASCII")
    val text = new String(mp4, java.nio.charset.StandardCharsets.UTF_8)
    assert(java.util.Arrays.equals(
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8), mp4),
      "the crafted text must round-trip byte-exact")
    assert(Multimodal.VideoHeader.parse(mp4).isDefined)
    val df = Seq((7L, text)).toDF("doc_id", "text") // 7 % 7 == 0: fallback row
    val ex = intercept[Throwable] {
      Multimodal.asVideoMedia(spark, df, "doc_id", "text").collect()
    }
    assert(messages(ex).exists(_.contains("parse as an MP4 container")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
    // a non-multiple-of-7 id wraps the same text as video/mp4 fine
    val ok = Multimodal.asVideoMedia(spark,
      Seq((8L, text)).toDF("doc_id", "text"), "doc_id", "text").collect()
    assert(ok.head.getString(1) == "video/mp4")
  }

  test("asAudioMedia rejects text/plain rows whose bytes parse as WAV") {
    // channels=2 keeps every derived field (rate 8000, byteRate 32000)
    // under 0x80 per byte — all-ASCII, so it round-trips as a String
    val wav = Multimodal.AudioHeader.wavBytes(2, 8000, 16,
      "y".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    assume(wav.forall(_ >= 0), "fixture bytes must all be ASCII")
    val text = new String(wav, java.nio.charset.StandardCharsets.UTF_8)
    assert(java.util.Arrays.equals(
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8), wav))
    assert(Multimodal.AudioHeader.parse(wav).isDefined)
    val df = Seq((14L, text)).toDF("doc_id", "text")
    val ex = intercept[Throwable] {
      Multimodal.asAudioMedia(spark, df, "doc_id", "text").collect()
    }
    assert(messages(ex).exists(_.contains("parse as an audio container")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
  }

  test("text_compress_ratio: self-verifying invariants hold at sf0.001") {
    val out = SparkEntry.queries("text_compress_ratio")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    assert(out.forall(_.getBoolean(2)), "deflate bound violated")
    assert(out.forall(_.getBoolean(3)), "separation covariance violated")
    // and the exact column really is the byte length
    val nb = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), octet_length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.forall(r => nb(r.getLong(0)) == r.getLong(1)))
  }

  test("migrate resume on an EMPTY half-migrated keys table fails loudly") {
    val path = Files.createTempDirectory("graft-r12-mig").toString + "/idx"
    val corpus = (1L to 6L).map(i =>
      (i, s"document number $i with some shingled words to index here"))
      .toDF("doc_id", "text")
    Dedup.buildDedupIndex(corpus, "doc_id", "text", path)
    Dedup.migrateToPartitionedIndex(spark, path)
    // simulate the crash window: marker never landed, keys banded but empty
    val marker = Dedup.layoutMarkerPath(path)
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(marker, false)
    val keysSchema = spark.read.parquet(s"$path/keys").schema
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], keysSchema)
      .write.mode("overwrite").parquet(s"$path/keys")
    val ex = intercept[Throwable] {
      Dedup.migrateToPartitionedIndex(spark, path)
    }
    assert(messages(ex).exists(m =>
      m.contains("half-migrated keys table") && m.contains("empty")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
  }
}
