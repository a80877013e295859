package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Multimodal, Similarity}
import graft.functions.Multimodal.ImageHeader

/** Round-6 operators: real PNG/JPEG container-header parsing and the
  * image-media decode path. */
class Round6OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val payload = "hello media payload".getBytes("UTF-8")

  test("ImageHeader parses PNG IHDR width/height from real bytes") {
    val b = ImageHeader.pngBytes(800, 600, payload)
    assert(ImageHeader.parse(b).contains(("image/png", 800, 600, 33)))
    // the written IHDR CRC is real, not filler — external tools would
    // accept the header
    val crc = new java.util.zip.CRC32()
    crc.update(b, 12, 17)
    val declared = java.nio.ByteBuffer.wrap(b, 29, 4).getInt
    assert(declared == crc.getValue.toInt, "IHDR CRC must be real")
  }

  test("ImageHeader parses JPEG SOF dims, skipping APP0 and fill bytes") {
    val b = ImageHeader.jpegBytes(1024, 768, payload)
    assert(ImageHeader.parse(b).contains(("image/jpeg", 1024, 768, 39)))
    // extra 0xFF fill byte before the SOF marker (FF FF C0 …) — the
    // scanner must treat it as padding, not lose marker sync
    val (pre, post) = b.splitAt(20) // SOI + APP0 | SOF…
    val parsed = ImageHeader.parse(pre ++ Array(0xFF.toByte) ++ post)
    assert(parsed.exists { case (f, w, h, _) => f == "image/jpeg" && w == 1024 && h == 768 })
  }

  test("ImageHeader rejects malformed bytes") {
    assert(ImageHeader.parse(null).isEmpty)
    assert(ImageHeader.parse(payload).isEmpty, "plain text is not an image")
    assert(ImageHeader.parse(Array[Byte]()).isEmpty)
    // PNG signature but the first chunk is not IHDR
    val notIhdr = ImageHeader.pngBytes(10, 10, payload)
    notIhdr(12) = 'X'.toByte
    assert(ImageHeader.parse(notIhdr).isEmpty)
    // JPEG SOI but SOS appears before any SOF (no frame header to read)
    val sosFirst = Array(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x04, 0x01, 0x00)
      .map(_.toByte)
    assert(ImageHeader.parse(sosFirst).isEmpty)
    // truncated mid-segment: declared length runs past the buffer
    val truncated = ImageHeader.jpegBytes(64, 48, payload).take(10)
    assert(ImageHeader.parse(truncated).isEmpty)
  }

  test("decodeFeatures: real header dims for containers, stub for bare text") {
    import spark.implicits._
    val docs = Seq(
      (3L, "jpeg row body"), // id%3=0 → JPEG container
      (5L, "png row body"), // → PNG container
      (7L, "plain row body")) // id%7=0 → bare text, stub fallback
      .toDF("doc_id", "text")
    val media = Multimodal.asImageMedia(spark, docs, "doc_id", "text")
    val got = Multimodal.decodeFeatures(spark, media).collect()
      .map(f => f.docId -> f).toMap

    def expectDims(s: String): (Int, Int) =
      (s.getBytes("UTF-8").length % 640 + 64, s.getBytes("UTF-8").length % 480 + 48)

    val (jw, jh) = expectDims("jpeg row body")
    assert(got(3L).kind == "image/jpeg" && got(3L).width == jw && got(3L).height == jh)
    assert(got(3L).byteLen == "jpeg row body".length + 39)
    val (pw, ph) = expectDims("png row body")
    assert(got(5L).kind == "image/png" && got(5L).width == pw && got(5L).height == ph)
    assert(got(5L).byteLen == "png row body".length + 33)
    // stub fallback: kind passes through, dims from full byte length
    assert(got(7L).kind == "text/plain")
    assert(got(7L).byteLen == "plain row body".length)
    // fingerprint is the md5 of the post-header payload on ALL paths —
    // the same media dedups across containers
    val wantFp = java.security.MessageDigest.getInstance("MD5")
      .digest("jpeg row body".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(3L).fingerprint == wantFp)
  }

  test("persisted IVF index: probe ≡ inline ivfKnnJoin bit-for-bit, pruned scan") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "a", Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (1L, "a", Array(1.0f, 0.2f, 0.0f, 0.0f)),
      (2L, "a", Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, "b", Array(0.1f, 1.0f, 0.0f, 0.0f)),
      (4L, "b", Array(0.2f, 1.0f, 0.0f, 0.0f)),
      (5L, "c", Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (6L, "c", Array(0.0f, 0.0f, 0.9f, 0.1f))
    ).toDF("vec_id", "label", "embedding")
    val probes = Seq(
      (0L, Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.0f, 1.0f, 0.05f))
    ).toDF("probe_id", "__pv")

    val path = java.nio.file.Files
      .createTempDirectory("graft-ivf-idx").toString
    Similarity.buildIvfIndex(corpus, "vec_id", "embedding", "label", path,
      dims = 4)
    val indexed = Similarity.ivfKnnJoinIndexed(spark, path, probes,
      "vec_id", "embedding", "label", k = 3, nProbe = 2)
    val inline = Similarity.ivfKnnJoin(corpus, probes, "vec_id", "embedding",
      "label", k = 3, nProbe = 2, dims = 4)

    // bit-for-bit: identical rows including the double cosines
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    val (gi, gn) = (rows(indexed), rows(inline))
    assert(gi.nonEmpty && gi == gn)

    // partition pruning is real: the cell filter must land in the scan's
    // partitionFilters (pruned at file listing), not in dataFilters
    // (row-level, reads every file) — inputFiles reports the pre-pruning
    // relation, so inspect the executed plan instead
    val pruned = spark.read.parquet(s"$path/lists")
      .filter(col("__cellkey") === "a")
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in the pruned plan"))
    assert(scan.partitionFilters.exists(_.references.exists(
      _.name == "__cellkey")),
      "cell filter must be a partition filter, not a data filter")
  }
}
