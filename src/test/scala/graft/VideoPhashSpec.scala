package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{JpegCodec, Multimodal, PngCodec}

/** Video perceptual near-dup vs a plain-Scala model: the engine must
  * recover every frame hash through container walk → mdat → JPEG frame
  * split → real decode, while the model predicts the same hashes from
  * the fixture grid arithmetic (never touching a codec), and the
  * LSH-candidate path must equal the brute-force all-pairs rule. */
class VideoPhashSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val groups = 7

  /** Expected frame dHash straight from the grid arithmetic: cell
    * values ARE the box averages (constant 8×8 blocks), so dHash64 over
    * the full-resolution pixels equals dHash64 of the grid itself. */
  private def expectedFrameHash(g: Long, v: Long, fi: Int): Long = {
    val vf = if (v == 2 && fi == (g % 4).toInt) 2L else 0L
    val px = Array.tabulate(72 * 64) { i =>
      Multimodal.phashFixtureGray(g * 4 + fi, vf, (i / 72) / 8, (i % 72) / 8)
    }
    PngCodec.dHash64(px, 72, 64).get
  }

  private def expectedHashes(ids: Seq[Long]): Map[Long, Seq[Long]] =
    ids.filter(_ % 11 != 0).map { id =>
      val v = id % 3; val g = (id / 3) % groups
      id -> (0 until 4).map(fi => expectedFrameHash(g, v, fi))
    }.toMap

  private def bruteForcePairs(hs: Map[Long, Seq[Long]],
                              maxHamming: Int): Set[(Long, Long, Int, Int)] =
    (for {
      a <- hs.keys; b <- hs.keys if a < b
      if hs(a).length == hs(b).length
      hams = hs(a).zip(hs(b)).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }
      if hams.max <= maxHamming
    } yield (a, b, hs(a).length, hams.max)).toSet

  test("engine pairs equal the arithmetic model's brute-force pairs") {
    val ids = (0L until 120L)
    val media = Multimodal.videoPhashFixtureMedia(spark,
      ids.toDF("doc_id"), groups)
    val got = Multimodal.videoPhashNearDup(spark, media, maxHamming = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
    val want = bruteForcePairs(expectedHashes(ids), 3)
    assert(got == want)
    assert(want.nonEmpty, "fixture must generate pairs for the test to bite")
    // and the signatures themselves match the model frame-for-frame
    val sigs = Multimodal.videoPhashSignatures(spark, media)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(sigs == expectedHashes(ids))
  }

  test("re-encoded footage (different codec layout) pairs at hamming 0") {
    // v=0 (gray) and v=1 (4:2:0 color) of the same g carry identical
    // grids in every frame; ids 3g and 3g+1 share g
    val ids = Seq(3L, 4L) // g = 1, v = 0 and 1
    val media = Multimodal.videoPhashFixtureMedia(spark,
      ids.toDF("doc_id"), groups)
    val rows = Multimodal.videoPhashNearDup(spark, media, maxHamming = 3)
      .collect()
    assert(rows.length == 1)
    assert((rows.head.getLong(0), rows.head.getLong(1)) == (3L, 4L))
    assert(rows.head.getInt(3) == 0) // max_hamming
    assert(rows.head.getInt(2) == 4) // n_frames
  }

  test("malformed videos quarantine whole and never pair") {
    // id 0 and 11 are % 11 = 0 (dead-end entropy); they emit no
    // signature rows and appear in no pair
    val ids = Seq(0L, 11L, 12L, 13L) // 12, 13 share g = 4 % 7 = 4
    val media = Multimodal.videoPhashFixtureMedia(spark,
      ids.toDF("doc_id"), groups)
    val sig = Multimodal.videoPhashSignatures(spark, media).collect()
    assert(!sig.map(_.getLong(0)).contains(0L))
    assert(!sig.map(_.getLong(0)).contains(11L))
    val pairs = Multimodal.videoPhashNearDup(spark, media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((12L, 13L)))
  }

  test("one undecodable frame quarantines the whole video") {
    // hand-build: three good frames + one dead-entropy frame in one mdat
    val good = (0 until 3).map { fi =>
      JpegCodec.encode(Array.fill(72 * 64)(100 + fi * 10), 72, 64,
        JpegCodec.Gray, JpegCodec.unitQuant)
    }
    val g0 = JpegCodec.encode(Array.fill(72 * 64)(128), 72, 64,
      JpegCodec.Gray, JpegCodec.unitQuant)
    var i = 2
    while (!((g0(i) & 0xFF) == 0xFF && (g0(i + 1) & 0xFF) == 0xDA)) i += 1
    val sosEnd = i + 2 + (((g0(i + 2) & 0xFF) << 8) | (g0(i + 3) & 0xFF))
    val dead = g0.take(sosEnd) ++
      Array.fill(24)(Array(0xFF.toByte, 0x00.toByte)).flatten ++
      Array(0xFF.toByte, 0xD9.toByte)
    val payload = (good :+ dead).reduce(_ ++ _)
    val bytes = graft.functions.Multimodal.VideoHeader.mp4Bytes(
      "isom", 1000, 4000L, 72, 64, v1 = false, payload)
    val media = Seq((1L, "video/mp4", bytes, bytes.length.toLong))
      .toDF("doc_id", "kind", "content", "byte_len")
    assert(Multimodal.videoPhashSignatures(spark, media).count() == 0)
  }

  test("different frame counts never pair, even with identical prefixes") {
    val frames = (0 until 4).map { fi =>
      JpegCodec.encode(Array.tabulate(72 * 64)(i => (i + fi * 3) % 200),
        72, 64, JpegCodec.Gray, JpegCodec.unitQuant)
    }
    def vid(n: Int) = graft.functions.Multimodal.VideoHeader.mp4Bytes(
      "isom", 1000, 1000L * n, 72, 64, v1 = false,
      frames.take(n).reduce(_ ++ _))
    val media = Seq((1L, vid(4)), (2L, vid(3)))
      .map { case (id, b) => (id, "video/mp4", b, b.length.toLong) }
      .toDF("doc_id", "kind", "content", "byte_len")
    assert(Multimodal.videoPhashNearDup(spark, media, 3).count() == 0)
  }

  /** Cross-corpus model: every (probe, corpus) pair with equal frame
    * counts and every aligned frame within maxHamming. */
  private def bruteForceCross(ph: Map[Long, Seq[Long]],
                              ch: Map[Long, Seq[Long]],
                              maxHamming: Int): Set[(Long, Long, Int, Int)] =
    (for {
      p <- ph.keys; c <- ch.keys
      if ph(p).length == ch(c).length
      hams = ph(p).zip(ch(c)).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }
      if hams.max <= maxHamming
    } yield (p, c, ph(p).length, hams.max)).toSet

  private def probeRows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet

  test("persisted index probe equals the cross-pair model") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-vphash-idx").toString
    val ids = (0L until 120L)
    val corpus = Multimodal.videoPhashFixtureMedia(spark,
      ids.toDF("doc_id"), groups)
    val probes = Multimodal.videoPhashFixtureMedia(spark,
      ids.map(_ + 10000L).toDF("doc_id"), groups)
    Multimodal.buildVideoPhashIndex(spark, corpus, path)
    val got = probeRows(
      Multimodal.videoPhashDedupAgainst(spark, path, probes, 3))
    val want = bruteForceCross(expectedHashes(ids.map(_ + 10000L)),
      expectedHashes(ids), 3)
    assert(got == want)
    assert(want.nonEmpty, "fixture must generate cross pairs")
  }

  test("video index append ≡ fresh build; compaction bit-identical") {
    val pathA = java.nio.file.Files
      .createTempDirectory("graft-vphash-app").toString
    val pathB = java.nio.file.Files
      .createTempDirectory("graft-vphash-all").toString
    val ids = (0L until 90L)
    val corpus = Multimodal.videoPhashFixtureMedia(spark,
      ids.toDF("doc_id"), groups).localCheckpoint()
    val probes = Multimodal.videoPhashFixtureMedia(spark,
      ids.map(_ + 10000L).toDF("doc_id"), groups).localCheckpoint()
    Multimodal.buildVideoPhashIndex(spark,
      corpus.filter(col("doc_id") % 3 === 0), pathA)
    Multimodal.appendToVideoPhashIndex(spark,
      corpus.filter(col("doc_id") % 3 === 1), pathA)
    Multimodal.appendToVideoPhashIndex(spark,
      corpus.filter(col("doc_id") % 3 === 2), pathA)
    Multimodal.buildVideoPhashIndex(spark, corpus, pathB)
    def probe(p: String) = probeRows(
      Multimodal.videoPhashDedupAgainst(spark, p, probes, 3))
    val fresh = probe(pathB)
    assert(probe(pathA) == fresh)
    def files(p: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) Seq(f)
        else Option(f.listFiles()).map(_.toSeq.flatMap(walk)).getOrElse(Nil)
      walk(new java.io.File(p)).count(_.getName.endsWith(".parquet"))
    }
    val before = files(pathA)
    Multimodal.compactVideoPhashIndex(spark, pathA)
    assert(files(pathA) < before)
    assert(probe(pathA) == fresh)
  }

  test("streaming video ingest: epochs idempotent, probe-equal, compact") {
    import graft.streaming.StreamOps
    val path = java.nio.file.Files
      .createTempDirectory("graft-vphash-ing").toString
    val ids = (0L until 90L)
    val corpus = Multimodal.videoPhashFixtureMedia(spark,
      ids.toDF("doc_id"), groups).localCheckpoint()
    val probes = Multimodal.videoPhashFixtureMedia(spark,
      ids.map(_ + 10000L).toDF("doc_id"), groups).localCheckpoint()
    StreamOps.videoPhashIngestBootstrap(spark,
      corpus.filter(col("doc_id") < 30), path)
    val e1 = corpus.filter(col("doc_id") >= 30 && col("doc_id") < 60)
      .localCheckpoint()
    val e2 = corpus.filter(col("doc_id") >= 60).localCheckpoint()
    StreamOps.videoPhashIngestEpoch(e1, 0L, path, 8)
    StreamOps.videoPhashIngestEpoch(e2, 1L, path, 8)
    def probe() = probeRows(
      Multimodal.videoPhashDedupAgainst(spark, path, probes, 3))
    val want = bruteForceCross(expectedHashes(ids.map(_ + 10000L)),
      expectedHashes(ids), 3)
    val once = probe()
    assert(once == want)
    // crash replay of epoch 1: whole-epoch overwrite, bit-identical
    StreamOps.videoPhashIngestEpoch(e2, 1L, path, 8)
    assert(probe() == once)
    // epoch-layout compaction consolidates and keeps the probe result
    Multimodal.compactVideoPhashIndex(spark, path)
    assert(probe() == once)
  }

  test("a missing video index returns no pairs (typed-empty)") {
    val ids = (0L until 12L)
    val probes = Multimodal.videoPhashFixtureMedia(spark,
      ids.toDF("doc_id"), groups)
    val out = Multimodal.videoPhashDedupAgainst(spark,
      "/tmp/graft-vphash-definitely-absent", probes, 3)
    assert(out.columns.toSeq ==
      Seq("doc_id", "corpus_id", "n_frames", "max_hamming"))
    assert(out.count() == 0)
  }

  test("long videos sample maxFrames aligned positions deterministically") {
    val frames = (0 until 16).map { fi =>
      JpegCodec.encode(Array.fill(72 * 64)(10 + fi * 12), 72, 64,
        JpegCodec.Gray, JpegCodec.unitQuant)
    }
    val bytes = graft.functions.Multimodal.VideoHeader.mp4Bytes(
      "isom", 1000, 16000L, 72, 64, v1 = false, frames.reduce(_ ++ _))
    val media = Seq((1L, "video/mp4", bytes, bytes.length.toLong))
      .toDF("doc_id", "kind", "content", "byte_len")
    val sig = Multimodal.videoPhashSignatures(spark, media, maxFrames = 8)
      .collect().sortBy(_.getInt(1))
    assert(sig.length == 8)
    // sampled positions are i*16/8 = the even frames; constant-gray
    // frames hash to 0 regardless, so check via per-frame hashes of the
    // sampled originals instead: decode each expected frame directly
    val expected = (0 until 8).map { i =>
      JpegCodec.dHashOf(frames((i * 16) / 8)).get
    }
    assert(sig.map(_.getLong(2)).toSeq == expected)
  }
}
