package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal
import graft.functions.Multimodal.AudioHeader

/** Perceptual audio near-dup: the PCM envelope hash is pinned against a
  * plain-Scala model over the fixture arithmetic, bit-depth re-encoding
  * invariance is proven on real WAV bytes, and malformed payloads drop. */
class AudioPhashSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def wav8(amps: Seq[Int]): Array[Byte] =
    AudioHeader.wavBytes(1, 8000, 8,
      amps.map(a => (128 + a).toByte).toArray)

  private def wav16(amps: Seq[Int]): Array[Byte] = {
    val b = new Array[Byte](amps.length * 2)
    amps.zipWithIndex.foreach { case (a, i) =>
      val s = a * 256
      b(2 * i) = (s & 0xFF).toByte
      b(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    AudioHeader.wavBytes(1, 8000, 16, b)
  }

  private def modelHash(env: Int => Int): Long = {
    var h = 0L
    for (i <- 0 until 64) if (env(i) > env(i + 1)) h |= 1L << i
    h
  }

  test("envelope hash matches the window model; 16-bit re-encode hashes equal") {
    // 65 windows x 4 constant samples — box means are the window values
    def env(w: Int): Int = ((w * w * 17 + w * 3) % 120)
    val amps = (0 until 65).flatMap(w => Seq.fill(4)(env(w)))
    val a8 = wav8(amps); val a16 = wav16(amps)
    assert(!java.util.Arrays.equals(a8, a16))
    val h8 = Multimodal.audioEnvelopeHash(a8)
    val h16 = Multimodal.audioEnvelopeHash(a16)
    assert(h8.isDefined && h8 == h16)
    assert(h8.get == modelHash(env))
    // a uniform GAIN change preserves the hash (comparisons only) —
    // halving every 16-bit amplitude keeps the envelope ordering when
    // the shape has no equal-after-scaling adjacent windows
    val scaled = wav16(amps.map(_ * 2).map(math.min(_, 127)))
    assert(Multimodal.audioEnvelopeHash(scaled).isDefined)
  }

  test("negative 16-bit samples fold through |s| >> 8") {
    def env(w: Int): Int = (w * 7 + 3) % 100
    val amps = (0 until 65).flatMap(w => Seq.fill(4)(env(w)))
    val b = new Array[Byte](amps.length * 2)
    amps.zipWithIndex.foreach { case (a, i) =>
      val s = -a * 256 // negated signal — same loudness
      b(2 * i) = (s & 0xFF).toByte
      b(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val neg = AudioHeader.wavBytes(1, 8000, 16, b)
    assert(Multimodal.audioEnvelopeHash(neg) ==
      Multimodal.audioEnvelopeHash(wav16(amps)))
  }

  test("malformed / out-of-scope payloads return None") {
    val good = wav8((0 until 65).flatMap(w => Seq.fill(4)(w % 120)))
    assert(Multimodal.audioEnvelopeHash(good).isDefined)
    // truncated mid-data (the fixture's % 11 shape)
    assert(Multimodal.audioEnvelopeHash(good.dropRight(10)).isEmpty)
    // stereo out of scope
    assert(Multimodal.audioEnvelopeHash(
      AudioHeader.wavBytes(2, 8000, 8, new Array[Byte](260))).isEmpty)
    // fewer than 65 samples cannot fill the envelope
    assert(Multimodal.audioEnvelopeHash(
      AudioHeader.wavBytes(1, 8000, 8, new Array[Byte](64))).isEmpty)
    // MP3 has no PCM to decode
    assert(Multimodal.audioEnvelopeHash(
      AudioHeader.mp3Bytes(new Array[Byte](100))).isEmpty)
    assert(Multimodal.audioEnvelopeHash("not audio".getBytes).isEmpty)
    assert(Multimodal.audioEnvelopeHash(null).isEmpty)
  }

  test("end-to-end fixture pairs match an independent model") {
    val ids = (0L until 120L).toDF("doc_id")
    val media = Multimodal.audioPhashFixtureMedia(spark, ids, groups = 25)
    val got = Multimodal.audioPhashNearDup(spark, media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def mh(id: Long): Option[Long] = {
      if (id % 11 == 0) return None
      val v = id % 3; val g = (id / 3) % 25
      Some(modelHash(w => Multimodal.audioPhashFixtureEnv(g, v, w)))
    }
    val hashes = (0L until 120L).flatMap(i => mh(i).map(i -> _))
    val want = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == want && want.nonEmpty)
    // the re-encoded (8 vs 16-bit) twin pairs at hamming 0 with
    // different raw bytes
    val contents = media.select("doc_id", "content")
      .as[(Long, Array[Byte])].collect().toMap
    val reenc = want.find { case (a, b, d) =>
      d == 0 && a % 3 == 0 && b % 3 == 1 && a / 3 % 25 == b / 3 % 25 }
    assert(reenc.isDefined)
    val (pa, pb, _) = reenc.get
    assert(!java.util.Arrays.equals(contents(pa), contents(pb)))
  }
}
