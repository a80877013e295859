package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal.VideoHeader

/** Round-11: MP4/ISO-BMFF box walk — round-trips of both box versions,
  * the to-EOF and largesize size encodings, and loud rejection of every
  * malformed-container shape instead of misparsing. */
class Round11VideoSpec extends AnyFunSuite {

  private val payload =
    "the media payload bytes".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def md5(b: Array[Byte], off: Int = 0, len: Int = -1): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(b, off, if (len < 0) b.length - off else len)
    md.digest().map("%02x".format(_)).mkString
  }

  test("v0 container round-trips every declared field") {
    val b = VideoHeader.mp4Bytes("isom", 1000, 4200L, 640, 360, v1 = false,
      payload)
    assert(b.length == 348 + payload.length) // the documented v0 header
    val i = VideoHeader.parse(b).get
    assert(i.brand == "isom" && i.timescale == 1000L && i.duration == 4200L)
    assert(i.durationMs == 4200L && i.trackCount == 2)
    assert(i.width == 640 && i.height == 360)
    assert(i.mdatLen == payload.length &&
      md5(b, i.mdatOffset.toInt, i.mdatLen.toInt) == md5(payload))
  }

  test("v1 container (64-bit mvhd/tkhd fields) round-trips") {
    val b = VideoHeader.mp4Bytes("mp42", 90000, 123456789L, 1920, 1080,
      v1 = true, payload)
    assert(b.length == 384 + payload.length) // the documented v1 header
    val i = VideoHeader.parse(b).get
    assert(i.brand == "mp42" && i.timescale == 90000L &&
      i.duration == 123456789L)
    assert(i.durationMs == 123456789L * 1000L / 90000L)
    assert(i.width == 1920 && i.height == 1080 && i.trackCount == 2)
  }

  test("fingerprint payload is container-independent (v0 ≡ v1 mdat bytes)") {
    val a = VideoHeader.mp4Bytes("isom", 600, 100L, 64, 48, v1 = false, payload)
    val b = VideoHeader.mp4Bytes("mp42", 1000, 900L, 320, 240, v1 = true, payload)
    val (ia, ib) = (VideoHeader.parse(a).get, VideoHeader.parse(b).get)
    assert(md5(a, ia.mdatOffset.toInt, ia.mdatLen.toInt) ==
      md5(b, ib.mdatOffset.toInt, ib.mdatLen.toInt),
      "identical media must fingerprint identically across containers")
  }

  test("size == 0 extends the box to EOF") {
    val b = VideoHeader.mp4Bytes("isom", 600, 100L, 64, 48, v1 = false, payload)
    // patch the mdat box's size field to 0 (its offset: header - 8)
    val off = 348 - 8
    b(off) = 0; b(off + 1) = 0; b(off + 2) = 0; b(off + 3) = 0
    val i = VideoHeader.parse(b).get
    assert(i.mdatLen == payload.length, s"to-EOF mdat: $i")
  }

  test("size == 1 reads the 64-bit largesize") {
    val base = VideoHeader.mp4Bytes("isom", 600, 100L, 64, 48, v1 = false,
      Array.emptyByteArray)
    // replace the empty mdat (last 8 bytes) with a largesize mdat
    val bb = java.nio.ByteBuffer.allocate(base.length - 8 + 16 + payload.length)
    bb.put(base, 0, base.length - 8)
    bb.putInt(1).put("mdat".getBytes("US-ASCII"))
      .putLong(16L + payload.length).put(payload)
    val i = VideoHeader.parse(bb.array()).get
    assert(i.mdatLen == payload.length &&
      md5(bb.array(), i.mdatOffset.toInt, i.mdatLen.toInt) == md5(payload))
  }

  test("malformed containers are rejected, never misparsed") {
    val good = VideoHeader.mp4Bytes("isom", 1000, 100L, 64, 48, v1 = false,
      payload)
    def patched(f: Array[Byte] => Array[Byte]): Option[_] =
      VideoHeader.parse(f(good.clone()))
    // truncated mid-box: cut inside the moov tree
    assert(VideoHeader.parse(good.take(100)).isEmpty, "truncated moov")
    // truncated box header: fewer than 8 bytes left over
    assert(VideoHeader.parse(good.take(good.length - payload.length - 3))
      .isEmpty, "truncated mdat header")
    // a box size overrunning the data
    assert(patched { b =>
      b(24) = 0x7F.toByte; b // moov size becomes enormous
    }.isEmpty, "size overrun")
    // an impossible size (< 8, not the 0/1 escapes)
    assert(patched { b =>
      b(24) = 0; b(25) = 0; b(26) = 0; b(27) = 5; b
    }.isEmpty, "size < 8")
    // largesize smaller than its own 16-byte header
    assert({
      val bb = java.nio.ByteBuffer.allocate(24 + 16)
      bb.put(good, 0, 24) // keep the valid ftyp
      bb.putInt(1).put("mdat".getBytes("US-ASCII")).putLong(8L)
      VideoHeader.parse(bb.array())
    }.isEmpty, "largesize < 16")
    // not an MP4 at all: no leading ftyp
    assert(VideoHeader.parse(good.drop(24)).isEmpty, "missing ftyp")
    assert(VideoHeader.parse("just some plain text bytes".getBytes("UTF-8"))
      .isEmpty, "bare text")
    assert(VideoHeader.parse(null).isEmpty &&
      VideoHeader.parse(Array.emptyByteArray).isEmpty)
    // zero timescale: a duration nobody can interpret
    assert(patched { b =>
      // mvhd timescale at ftyp(24) + moov hdr(8) + mvhd hdr(8) + 12
      val o = 24 + 8 + 8 + 12
      b(o) = 0; b(o + 1) = 0; b(o + 2) = 0; b(o + 3) = 0; b
    }.isEmpty, "zero timescale")
    // truncated tkhd payload (box claims fewer bytes than v0 needs)
    assert(patched { b =>
      val trakOff = 24 + 8 + 108 // first trak box inside moov
      val tkhdOff = trakOff + 8
      b(tkhdOff) = 0; b(tkhdOff + 1) = 0; b(tkhdOff + 2) = 0
      b(tkhdOff + 3) = 40 // tkhd box shrunk below the v0 layout
      b
    }.isEmpty, "truncated tkhd")
  }

  test("a valid container with no mdat parses with mdatOffset = -1") {
    val b = VideoHeader.mp4Bytes("isom", 600, 100L, 64, 48, v1 = false,
      Array.emptyByteArray).dropRight(8)
    val i = VideoHeader.parse(b).get
    assert(i.mdatOffset == -1L && i.width == 64)
  }
}
