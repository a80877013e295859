package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal
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
}
