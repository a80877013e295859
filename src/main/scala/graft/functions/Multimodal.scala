package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing (SURVEY §2.6): image/audio/video payloads
 * travel as opaque `binary` columns with typed metadata; decode /
 * feature-extract / frame-sample are per-partition operations over the
 * binary payloads.
 *
 * Container-header metadata (PNG IHDR / JPEG SOF width, height, format)
 * is parsed for REAL — pure byte arithmetic, no codec ([[ImageHeader]]).
 * Pixel/sample decoding needs actual codecs, which are NOT available in
 * this environment, so that step is a clearly-marked deterministic stub
 * ([[StubDecoder]]) — the Spark-side plumbing (schema, batching,
 * partition-parallel execution, metadata extraction, frame sampling) is
 * real and tested. Swapping [[StubDecoder.decode]] for a JNI/FFI codec
 * call changes nothing upstream.
 *
 * Scale notes: binary payloads make rows wide — the media scan should set
 * a smaller `spark.sql.files.maxPartitionBytes` so partitions stay
 * executor-memory-sized, and metadata-only queries must prune the binary
 * column (columnar parquet gives that for free as long as nothing selects
 * `content`).
 */
object Multimodal {

  /** A decoded media frame/feature row. */
  case class MediaFeature(docId: Long, kind: String, byteLen: Long,
                          width: Int, height: Int, fingerprint: String)

  /**
   * Real container-header parsing: PNG IHDR and JPEG SOF width/height
   * extraction is pure byte arithmetic on the binary column — no codec
   * needed. This is the genuinely-parseable slice of media decode; only
   * pixel/sample decoding remains stubbed ([[StubDecoder]]).
   *
   * `parse` returns (format, width, height, headerLen) where headerLen is
   * the offset just past the parsed header (PNG: signature + IHDR chunk;
   * JPEG: through the SOF segment) — the fixture payload begins there.
   */
  object ImageHeader {
    private val PngSig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    private def u8(b: Byte): Int = b & 0xFF
    private def be32(b: Array[Byte], o: Int): Long =
      (u8(b(o)).toLong << 24) | (u8(b(o + 1)) << 16) |
        (u8(b(o + 2)) << 8) | u8(b(o + 3))
    private def be16(b: Array[Byte], o: Int): Int =
      (u8(b(o)) << 8) | u8(b(o + 1))

    def parse(bytes: Array[Byte]): Option[(String, Int, Int, Int)] =
      if (bytes == null) None else parsePng(bytes).orElse(parseJpeg(bytes))

    /** PNG: 8-byte signature, then the IHDR chunk (len, "IHDR", width BE32,
      * height BE32, 5 mode bytes, CRC). */
    private def parsePng(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
      if (b.length < 33) return None
      var i = 0
      while (i < 8) { if (b(i) != PngSig(i)) return None; i += 1 }
      val ihdrLen = be32(b, 8)
      if (ihdrLen < 13) return None
      if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
        return None
      val w = be32(b, 16); val h = be32(b, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
      val hdr = 8 + 4 + 4 + ihdrLen.toInt + 4
      if (hdr > b.length) return None
      Some(("image/png", w.toInt, h.toInt, hdr))
    }

    /** JPEG: SOI, then scan segments (skipping by declared length, fill
      * bytes and standalone markers handled) until a SOF frame header:
      * FF Cx len(2) precision(1) height(2) width(2). */
    private def parseJpeg(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
      if (b.length < 4 || u8(b(0)) != 0xFF || u8(b(1)) != 0xD8) return None
      var p = 2
      while (p + 1 < b.length) {
        if (u8(b(p)) != 0xFF) return None // lost marker sync — corrupt
        val m = u8(b(p + 1))
        if (m == 0xFF) p += 1 // fill byte
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) p += 2 // standalone
        else if (m == 0xD9 || m == 0xDA) return None // EOI/SOS before SOF
        else {
          if (p + 3 >= b.length) return None
          val len = be16(b, p + 2)
          if (len < 2 || p + 2 + len > b.length) return None
          // SOF0-15 minus DHT(C4)/JPG(C8)/DAC(CC)
          val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
          if (isSof) {
            if (len < 7) return None
            val h = be16(b, p + 5); val w = be16(b, p + 7)
            if (w <= 0 || h <= 0) return None
            return Some(("image/jpeg", w, h, p + 2 + len))
          }
          p += 2 + len
        }
      }
      None
    }

    private def crc32(b: Array[Byte], off: Int, len: Int): Int = {
      val c = new java.util.zip.CRC32(); c.update(b, off, len); c.getValue.toInt
    }

    /** Structurally valid PNG prefix (signature + IHDR with a REAL CRC, so
      * external tools agree on the header) followed by `payload`. */
    def pngBytes(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(33 + payload.length)
      bb.put(PngSig)
      bb.putInt(13)
      bb.put("IHDR".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.putInt(w).putInt(h)
      // 8-bit depth, truecolor, deflate, adaptive filter, no interlace
      bb.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      bb.putInt(crc32(bb.array(), 12, 4 + 13))
      bb.put(payload)
      bb.array()
    }

    /** Structurally valid JPEG prefix (SOI + APP0/JFIF + SOF0 baseline,
      * 3 components — the APP0 exercises real segment skipping) followed
      * by `payload`. Header is 39 bytes. */
    def jpegBytes(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      require(w <= 0xFFFF && h <= 0xFFFF, s"JPEG dims are 16-bit: ${w}x$h")
      val bb = java.nio.ByteBuffer.allocate(39 + payload.length)
      bb.put(0xFF.toByte).put(0xD8.toByte) // SOI
      bb.put(0xFF.toByte).put(0xE0.toByte).putShort(16) // APP0
      bb.put("JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.put(0.toByte)
      bb.put(1.toByte).put(1.toByte) // version 1.1
      bb.put(0.toByte) // density units
      bb.putShort(1).putShort(1) // x/y density
      bb.put(0.toByte).put(0.toByte) // no thumbnail
      bb.put(0xFF.toByte).put(0xC0.toByte).putShort(17) // SOF0
      bb.put(8.toByte) // precision
      bb.putShort(h.toShort).putShort(w.toShort)
      bb.put(3.toByte) // components
      bb.put(1.toByte).put(0x22.toByte).put(0.toByte)
      bb.put(2.toByte).put(0x11.toByte).put(1.toByte)
      bb.put(3.toByte).put(0x11.toByte).put(1.toByte)
      bb.put(payload)
      bb.array()
    }
  }

  /** A decoded audio container row ([[AudioHeader]]): real header fields,
    * no sample decode. For MP3 `bitsPerSample` is 0 (the container does
    * not declare it) and duration derives from the CBR bitrate. */
  case class AudioFeature(docId: Long, format: String, byteLen: Long,
                          channels: Int, sampleRate: Int, bitsPerSample: Int,
                          durationMs: Long, fingerprint: String)

  /**
   * Real audio container-header parsing — WAV/RIFF chunk walk and MP3
   * (ID3v2-skipping) frame-header decode: the audio analogue of
   * [[ImageHeader]], pure byte arithmetic, no codec. Sample decoding
   * stays stubbed for the same reason as pixels.
   */
  object AudioHeader {
    /** (format, channels, sampleRate, bitsPerSample, bitrateKbps,
      * headerLen, dataLen): headerLen is the offset of the first data
      * byte; dataLen the declared (WAV) or remaining (MP3) data bytes. */
    case class AudioInfo(format: String, channels: Int, sampleRate: Int,
                         bitsPerSample: Int, bitrateKbps: Int,
                         headerLen: Int, dataLen: Long)

    private def u8(b: Byte): Int = b & 0xFF
    private def le16(b: Array[Byte], o: Int): Int = u8(b(o)) | (u8(b(o + 1)) << 8)
    private def le32(b: Array[Byte], o: Int): Long =
      u8(b(o)).toLong | (u8(b(o + 1)).toLong << 8) |
        (u8(b(o + 2)).toLong << 16) | (u8(b(o + 3)).toLong << 24)
    private def tag(b: Array[Byte], o: Int, t: String): Boolean =
      b.length >= o + 4 && (0 until 4).forall(i => b(o + i) == t.charAt(i).toByte)

    def parse(bytes: Array[Byte]): Option[AudioInfo] =
      if (bytes == null) None else parseWav(bytes).orElse(parseMp3(bytes))

    /** RIFF/WAVE: 12-byte RIFF header, then (id, LE32 size, data,
      * even-pad) chunks; `fmt ` must precede `data` (the spec's order),
      * unknown chunks (LIST, cue, ...) are skipped by declared size. */
    private def parseWav(b: Array[Byte]): Option[AudioInfo] = {
      if (b.length < 44 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
      var p = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // ch, rate, byteRate, bits
      while (p + 8 <= b.length) {
        val size = le32(b, p + 4)
        if (size < 0 || p + 8 + size > b.length) return None // overrun
        if (tag(b, p, "fmt ")) {
          if (size < 16) return None
          val ch = le16(b, p + 8 + 2)
          val rate = le32(b, p + 8 + 4)
          val byteRate = le32(b, p + 8 + 8)
          val bits = le16(b, p + 8 + 14)
          if (ch <= 0 || rate <= 0 || rate > Int.MaxValue || bits <= 0)
            return None
          fmt = Some((ch, rate.toInt, byteRate.toInt, bits))
        } else if (tag(b, p, "data")) {
          val (ch, rate, byteRate, bits) = fmt.getOrElse(return None)
          val kbps = byteRate * 8 / 1000
          return Some(AudioInfo("audio/wav", ch, rate, bits, kbps,
            p + 8, size))
        }
        p += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
      }
      None
    }

    // MPEG1 Layer III frame-header tables (the public ISO/IEC 11172-3
    // values every MP3 tool ships)
    private val Mp3Kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
      160, 192, 224, 256, 320)
    private val Mp3Rates = Array(44100, 48000, 32000)

    /** MP3: skip an ID3v2 tag if present (10-byte header + synchsafe
      * size), then decode the first MPEG1 Layer III frame header:
      * 11-bit sync, version/layer bits, bitrate + sample-rate indices,
      * channel mode. Free-format (idx 0) and reserved (15) rejected. */
    private def parseMp3(b: Array[Byte]): Option[AudioInfo] = {
      var p = 0
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        // synchsafe 28-bit size, high bit of each byte must be clear
        if ((0 until 4).exists(i => u8(b(6 + i)) >= 0x80)) return None
        val size = (u8(b(6)) << 21) | (u8(b(7)) << 14) |
          (u8(b(8)) << 7) | u8(b(9))
        p = 10 + size
      }
      if (p + 4 > b.length) return None
      if (u8(b(p)) != 0xFF || (u8(b(p + 1)) & 0xE0) != 0xE0) return None
      val version = (u8(b(p + 1)) >> 3) & 3 // 3 = MPEG1
      val layer = (u8(b(p + 1)) >> 1) & 3   // 1 = Layer III
      if (version != 3 || layer != 1) return None
      val bitrateIdx = (u8(b(p + 2)) >> 4) & 15
      val rateIdx = (u8(b(p + 2)) >> 2) & 3
      if (bitrateIdx == 0 || bitrateIdx == 15 || rateIdx == 3) return None
      val mode = (u8(b(p + 3)) >> 6) & 3
      val channels = if (mode == 3) 1 else 2
      Some(AudioInfo("audio/mpeg", channels, Mp3Rates(rateIdx), 0,
        Mp3Kbps(bitrateIdx), p + 4, (b.length - p - 4).toLong))
    }

    /** Structurally valid WAV: RIFF/WAVE + fmt (PCM) + a LIST chunk (so
      * parsers must really skip unknown chunks) + data holding `payload`.
      * Header is 64 bytes. */
    def wavBytes(channels: Int, sampleRate: Int, bitsPerSample: Int,
                 payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      bb.put("RIFF".getBytes(ascii)).putInt(56 + payload.length)
        .put("WAVE".getBytes(ascii))
      bb.put("fmt ".getBytes(ascii)).putInt(16)
      bb.putShort(1) // PCM
      bb.putShort(channels.toShort).putInt(sampleRate)
      bb.putInt(sampleRate * channels * bitsPerSample / 8) // byte rate
      bb.putShort((channels * bitsPerSample / 8).toShort)  // block align
      bb.putShort(bitsPerSample.toShort)
      bb.put("LIST".getBytes(ascii)).putInt(12)
        .put("INFOpadpadpd".getBytes(ascii)) // 12-byte skippable chunk
      bb.put("data".getBytes(ascii)).putInt(payload.length)
      bb.put(payload)
      bb.array()
    }

    /** Structurally valid MP3 prefix: ID3v2.3 tag (10 + 20 zero bytes,
      * synchsafe size) + one MPEG1 Layer III header (128 kbps, 44100 Hz,
      * stereo) + `payload` as the frame data. Header is 34 bytes. */
    def mp3Bytes(payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(34 + payload.length)
      bb.put("ID3".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.put(3.toByte).put(0.toByte) // v2.3.0
      bb.put(0.toByte)               // flags
      bb.put(0.toByte).put(0.toByte).put(0.toByte).put(20.toByte) // synchsafe 20
      bb.put(new Array[Byte](20))
      // FF FB: sync + MPEG1 + Layer III + no CRC; 90: bitrate idx 9
      // (128 kbps) + rate idx 0 (44100); 00: stereo
      bb.put(0xFF.toByte).put(0xFB.toByte).put(0x90.toByte).put(0x00.toByte)
      bb.put(payload)
      bb.array()
    }
  }

  /** A decoded video container row ([[VideoHeader]]): real ISO-BMFF
    * header fields, no codec. */
  case class VideoFeature(docId: Long, format: String, byteLen: Long,
                          brand: String, timescale: Long, durationMs: Long,
                          trackCount: Int, width: Int, height: Int,
                          fingerprint: String)

  /**
   * Real MP4/ISO-BMFF container-header parsing — the video analogue of
   * [[AudioHeader]], pure byte arithmetic, no codec: a box walk over
   * `[size:be32][type:4cc][payload]` boxes (64-bit `largesize` when
   * size == 1, to-EOF when size == 0), reading `ftyp` (major brand),
   * `moov/mvhd` (timescale + duration, version 0's 32-bit and version
   * 1's 64-bit layouts), each `trak/tkhd` (16.16 fixed-point width and
   * height — video tracks carry dimensions, audio tracks read 0x0), and
   * locating `mdat` (the media payload). Frame/sample decode stays
   * stubbed like pixels and audio samples.
   */
  object VideoHeader {
    /** (brand, timescale, duration, trackCount, width, height,
      * mdatOffset, mdatLen): duration in timescale units; mdatOffset is
      * the first payload byte of the `mdat` box (-1 = no mdat). */
    case class VideoInfo(brand: String, timescale: Long, duration: Long,
                         trackCount: Int, width: Int, height: Int,
                         mdatOffset: Long, mdatLen: Long) {
      def durationMs: Long =
        if (timescale <= 0) 0L else duration * 1000L / timescale
    }

    private def u8(b: Byte): Int = b & 0xFF
    private def be32(b: Array[Byte], o: Int): Long =
      (u8(b(o)).toLong << 24) | (u8(b(o + 1)) << 16) |
        (u8(b(o + 2)) << 8) | u8(b(o + 3))
    private def be64(b: Array[Byte], o: Int): Long =
      (be32(b, o) << 32) | be32(b, o + 4)
    private def cc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Walk the boxes of `b` in [from, to): calls `f(type, payloadFrom,
      * payloadTo)` per box. Returns false on any malformed size
      * (truncated header, overrun, size < 8). */
    private def walk(b: Array[Byte], from: Long, to: Long)
                    (f: (String, Long, Long) => Boolean): Boolean = {
      var p = from
      while (p < to) {
        if (p + 8 > to) return false // truncated box header
        val size0 = be32(b, p.toInt)
        val typ = cc(b, p.toInt + 4)
        val (payload, end) =
          if (size0 == 1L) { // 64-bit largesize follows the type
            if (p + 16 > to) return false
            val ls = be64(b, p.toInt + 8)
            if (ls < 16) return false
            (p + 16, p + ls)
          }
          else if (size0 == 0L) (p + 8, to) // box extends to EOF
          else if (size0 < 8) return false  // impossible size
          else (p + 8, p + size0)
        if (end > to || payload > end) return false // size overruns data
        if (!f(typ, payload, end)) return false
        p = end
      }
      true
    }

    def parse(bytes: Array[Byte]): Option[VideoInfo] = {
      if (bytes == null || bytes.length < 16) return None
      if (cc(bytes, 4) != "ftyp") return None // MP4 files lead with ftyp
      var brand = ""
      var timescale = 0L
      var duration = 0L
      var tracks = 0
      var w = 0
      var h = 0
      var mdatOff = -1L
      var mdatLen = 0L
      def tkhd(from: Long, to: Long): Boolean = {
        val o = from.toInt
        val v = u8(bytes(o))
        // v0: ver/flags, ctime(4) mtime(4) id(4) res(4) dur(4) res(8)
        //     layer(2) alt(2) vol(2) res(2) matrix(36) w(4) h(4) = 84
        // v1: ctime/mtime/duration widen to 8 bytes = 96
        val need = if (v == 1) 96 else 84
        if (to - from < need) return false
        val wOff = o + (if (v == 1) 88 else 76)
        val tw = (be32(bytes, wOff) >> 16).toInt     // 16.16 fixed
        val th = (be32(bytes, wOff + 4) >> 16).toInt
        tracks += 1
        if (tw > 0 && th > 0) { w = math.max(w, tw); h = math.max(h, th) }
        true
      }
      def mvhd(from: Long, to: Long): Boolean = {
        val o = from.toInt
        val v = u8(bytes(o))
        if (v == 1) {
          if (to - from < 32) return false
          timescale = be32(bytes, o + 20)
          duration = be64(bytes, o + 24)
        } else {
          if (to - from < 24) return false
          timescale = be32(bytes, o + 12)
          duration = be32(bytes, o + 16)
        }
        timescale > 0
      }
      val ok = walk(bytes, 0L, bytes.length.toLong) {
        case ("ftyp", from, to) =>
          if (to - from < 8) false
          else { brand = cc(bytes, from.toInt); true }
        case ("moov", mFrom, mTo) =>
          walk(bytes, mFrom, mTo) {
            case ("mvhd", f, t) => mvhd(f, t)
            case ("trak", tFrom, tTo) =>
              walk(bytes, tFrom, tTo) {
                case ("tkhd", f, t) => tkhd(f, t)
                case _ => true
              }
            case _ => true
          }
        case ("mdat", from, to) =>
          mdatOff = from; mdatLen = to - from; true
        case _ => true // free, skip, udta, ... — skipped by size
      }
      if (!ok || brand.isEmpty || timescale <= 0) None
      else Some(VideoInfo(brand, timescale, duration, tracks, w, h,
        mdatOff, mdatLen))
    }

    private def ascii(s: String) =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

    /** Structurally valid MP4: ftyp(24) + moov(mvhd + video trak + audio
      * trak) + mdat holding `payload`. `v1` selects version-1 mvhd/tkhd
      * (64-bit ctime/mtime/duration fields — the largesize-free 64-bit
      * path). Header totals 348 bytes (v0) / 384 (v1) before the
      * payload. */
    def mp4Bytes(brand: String, timescale: Int, duration: Long,
                 w: Int, h: Int, v1: Boolean,
                 payload: Array[Byte]): Array[Byte] = {
      // a v0 box stores duration in 32 bits; silently wrapping it mod
      // 2^32 would emit a structurally-valid container whose parsed
      // duration contradicts the requested one
      require(v1 || (duration >= 0 && duration <= 0xFFFFFFFFL),
        s"duration $duration needs version-1 boxes (32-bit v0 field)")
      val mvhdSize = if (v1) 120 else 108
      val tkhdSize = if (v1) 104 else 92
      val trakSize = 8 + tkhdSize
      val moovSize = 8 + mvhdSize + 2 * trakSize
      val bb = java.nio.ByteBuffer.allocate(24 + moovSize + 8 + payload.length)
      bb.putInt(24).put(ascii("ftyp"))
        .put(ascii(brand)).putInt(0x200).put(ascii("isom")).put(ascii("mp42"))
      bb.putInt(moovSize).put(ascii("moov"))
      bb.putInt(mvhdSize).put(ascii("mvhd"))
      if (v1) {
        bb.putInt(0x01000000) // version 1, flags 0
        bb.putLong(0L).putLong(0L) // ctime, mtime
        bb.putInt(timescale).putLong(duration)
      } else {
        bb.putInt(0) // version 0, flags 0
        bb.putInt(0).putInt(0)
        bb.putInt(timescale).putInt(duration.toInt)
      }
      bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, vol
      bb.putLong(0L) // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt) // identity matrix
      (1 to 6).foreach(_ => bb.putInt(0)) // pre_defined
      bb.putInt(3) // next_track_ID
      def trak(trackId: Int, tw: Int, th: Int): Unit = {
        bb.putInt(trakSize).put(ascii("trak"))
        bb.putInt(tkhdSize).put(ascii("tkhd"))
        if (v1) {
          bb.putInt(0x01000007) // version 1, flags: enabled|in-movie
          bb.putLong(0L).putLong(0L)
          bb.putInt(trackId).putInt(0).putLong(duration)
        } else {
          bb.putInt(0x00000007)
          bb.putInt(0).putInt(0)
          bb.putInt(trackId).putInt(0).putInt(duration.toInt)
        }
        bb.putLong(0L) // reserved
        bb.putShort(0).putShort(0).putShort(0).putShort(0) // layer/alt/vol
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(bb.putInt)
        bb.putInt(tw << 16).putInt(th << 16) // 16.16 fixed
      }
      trak(1, w, h) // the video track carries the dimensions
      trak(2, 0, 0) // the audio track reads 0x0
      bb.putInt(8 + payload.length).put(ascii("mdat")).put(payload)
      bb.array()
    }
  }

  /**
   * Wrap a text table as a VIDEO media table ([[asImageMedia]]'s video
   * twin): structurally valid MP4 containers — brand/timescale/duration
   * and track dimensions derived from the payload length so an oracle
   * can predict them; version-1 boxes for every 3rd id (the 64-bit
   * field layout); every 7th id stays bare text/plain for the
   * no-container fallback. The text lands as the `mdat` payload.
   *
   * The text/plain arm REJECTS (loudly) a payload whose raw UTF-8
   * bytes themselves parse as MP4 — [[decodeVideoFeatures]] sniffs
   * actual bytes, so adversarial text carrying a structurally valid
   * `ftyp`+`moov` walk would decode as video/mp4 and silently diverge
   * from any oracle that predicts the fallback by id. (NULs and ASCII
   * are valid UTF-8, so such text is constructible; real prose never
   * is — see MultimodalSpec.)
   */
  def asVideoMedia(spark: SparkSession, df: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val l = payload.length
        val (kind, content) =
          if (id % 7 == 0) {
            if (VideoHeader.parse(payload).isDefined)
              throw new IllegalArgumentException(
                s"asVideoMedia: doc $id is a text/plain fallback row but " +
                  "its bytes parse as an MP4 container — it would decode " +
                  "as video/mp4 and break the by-id fallback contract; " +
                  "exclude or rewrite this document")
            ("text/plain", payload)
          }
          else {
            // v1 also when the duration outgrows a v0 box's 32-bit field
            // (≈43 MB of text at 100 units/byte) — mp4Bytes refuses to
            // wrap it silently
            val v1 = id % 3 == 0 || l.toLong * 100L > 0xFFFFFFFFL
            ("video/mp4", VideoHeader.mp4Bytes(
              brand = if (v1) "mp42" else "isom",
              timescale = Seq(600, 1000, 90000)(l % 3),
              duration = l.toLong * 100L,
              w = l % 640 + 64, h = l % 480 + 48, v1 = v1,
              payload = payload))
          }
        (id, kind, content, content.length.toLong)
      }.toDF("doc_id", "kind", "content", "byte_len")
  }

  /**
   * Partition-parallel video metadata extraction ([[decodeFeatures]]'s
   * video twin): container fields from the ACTUAL bytes via
   * [[VideoHeader]]; duration from the mvhd duration over its
   * timescale; fingerprint = md5 of the `mdat` payload, so
   * byte-identical media dedups across container metadata. No parseable
   * container → zeroed video fields + full-bytes md5 (the
   * [[StubDecoder]] convention).
   */
  def decodeVideoFeatures(spark: SparkSession,
                          media: DataFrame): Dataset[VideoFeature] = {
    import spark.implicits._
    media.select("doc_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          VideoHeader.parse(bytes) match {
            case Some(info) =>
              val md = java.security.MessageDigest.getInstance("MD5")
              if (info.mdatOffset >= 0)
                md.update(bytes, info.mdatOffset.toInt, info.mdatLen.toInt)
              else md.update(bytes)
              VideoFeature(id, "video/mp4", bytes.length.toLong,
                info.brand, info.timescale, info.durationMs,
                info.trackCount, info.width, info.height,
                md.digest().map("%02x".format(_)).mkString)
            case None =>
              val md = java.security.MessageDigest.getInstance("MD5")
              VideoFeature(id, kind, bytes.length.toLong, "", 0L, 0L, 0,
                0, 0, md.digest(bytes).map("%02x".format(_)).mkString)
          }
        }
      }
  }

  /**
   * Wrap a text table as an AUDIO media table ([[asImageMedia]]'s audio
   * twin): WAV (default, PCM params derived from the payload length so an
   * oracle can predict them) or MP3 (every 3rd id, fixed 128 kbps/44100
   * stereo frame); every 7th id stays bare text/plain for the no-container
   * fallback.
   *
   * Like [[asVideoMedia]], the text/plain arm rejects a payload whose
   * raw bytes parse as WAV (a text starting `RIFF....WAVE` with valid
   * chunk sizes is constructible in UTF-8); MP3 sync needs 0xFF bytes
   * no UTF-8 encoding emits, so only the WAV shape can collide.
   * ([[asImageMedia]] needs no guard: the PNG signature's 0x89 lead
   * byte and JPEG's 0xFF D8 SOI are both unencodable as UTF-8 text.)
   */
  def asAudioMedia(spark: SparkSession, df: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val (kind, content) =
          if (id % 7 == 0) {
            if (AudioHeader.parse(payload).isDefined)
              throw new IllegalArgumentException(
                s"asAudioMedia: doc $id is a text/plain fallback row but " +
                  "its bytes parse as an audio container — it would decode " +
                  "as audio and break the by-id fallback contract; " +
                  "exclude or rewrite this document")
            ("text/plain", payload)
          }
          else if (id % 3 == 0) ("audio/mpeg", AudioHeader.mp3Bytes(payload))
          else ("audio/wav", AudioHeader.wavBytes(
            1 + (payload.length % 2),
            Seq(8000, 16000, 44100)(payload.length % 3), 16, payload))
        (id, kind, content, content.length.toLong)
      }.toDF("doc_id", "kind", "content", "byte_len")
  }

  /**
   * Partition-parallel audio metadata extraction ([[decodeFeatures]]'s
   * audio twin): container fields from the ACTUAL bytes via
   * [[AudioHeader]]; duration from the declared data length over the
   * declared rate (WAV: dataLen / byteRate; MP3: dataLen over the CBR
   * bitrate — exact for CBR streams, the fixture shape); fingerprint =
   * md5 of the post-header payload, so byte-identical audio dedups
   * across containers. No parseable container → zeroed audio fields +
   * full-bytes md5 (the [[StubDecoder]] convention).
   */
  def decodeAudioFeatures(spark: SparkSession,
                          media: DataFrame): Dataset[AudioFeature] = {
    import spark.implicits._
    media.select("doc_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          AudioHeader.parse(bytes) match {
            case Some(info) =>
              val durationMs =
                if (info.format == "audio/wav")
                  // dataBits * 1000 / bitsPerSec — whole-bit arithmetic,
                  // never a zero divisor (parse guarantees all three > 0)
                  info.dataLen * 8000L /
                    (info.sampleRate.toLong * info.channels *
                      info.bitsPerSample)
                else info.dataLen * 8L / info.bitrateKbps
              val md = java.security.MessageDigest.getInstance("MD5")
              // hash the DECLARED data bytes, not everything after the
              // header: a spec-legal trailing chunk (LIST/INFO after
              // `data`) or the odd-size pad byte must not change the
              // fingerprint, or byte-identical audio stops dedup'ing
              // across containers
              md.update(bytes, info.headerLen,
                math.min(info.dataLen, (bytes.length - info.headerLen).toLong)
                  .toInt)
              AudioFeature(id, info.format, bytes.length.toLong,
                info.channels, info.sampleRate, info.bitsPerSample,
                durationMs, md.digest().map("%02x".format(_)).mkString)
            case None =>
              val md = java.security.MessageDigest.getInstance("MD5")
              AudioFeature(id, kind, bytes.length.toLong, 0, 0, 0, 0L,
                md.digest(bytes).map("%02x".format(_)).mkString)
          }
        }
      }
  }

  /**
   * Deterministic stand-in for the real pixel/sample decoder, used only
   * when [[ImageHeader.parse]] finds no parseable container: derives fake
   * dimensions and a fingerprint from the bytes. Replace with a real codec
   * (e.g. via FFI) in production — signature and batching stay identical.
   */
  object StubDecoder {
    def decode(docId: Long, kind: String, bytes: Array[Byte]): MediaFeature = {
      val len = bytes.length.toLong
      // fake "dimensions" derived deterministically from content length
      val w = (len % 640 + 64).toInt
      val h = (len % 480 + 48).toInt
      val md = java.security.MessageDigest.getInstance("MD5")
      val fp = md.digest(bytes).map("%02x".format(_)).mkString
      MediaFeature(docId, kind, len, w, h, fp)
    }
  }

  /** Media-table schema: opaque binary + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("byte_len", LongType, nullable = false)))

  /** Wrap a text table as a media table (content = utf-8 bytes) — the test
    * fixture for the binary plumbing. */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"), lit("text/plain").as("kind"),
      encode(col(textCol), "UTF-8").as("content"),
      length(encode(col(textCol), "UTF-8")).cast("long").as("byte_len"))

  /**
   * Wrap a text table as an IMAGE media table: each row's content is a
   * structurally valid PNG (default) or JPEG (every 3rd id) container —
   * real signature/IHDR/SOF bytes, dimensions derived from the payload
   * length so an oracle can predict them — with the utf-8 text as the
   * payload after the header. Every 7th id stays a bare text/plain
   * payload to exercise the decoder's no-container fallback.
   */
  def asImageMedia(spark: SparkSession, df: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val w = payload.length % 640 + 64
        val h = payload.length % 480 + 48
        val (kind, content) =
          if (id % 7 == 0) ("text/plain", payload)
          else if (id % 3 == 0) ("image/jpeg", ImageHeader.jpegBytes(w, h, payload))
          else ("image/png", ImageHeader.pngBytes(w, h, payload))
        (id, kind, content, content.length.toLong)
      }.toDF("doc_id", "kind", "content", "byte_len")
  }

  /**
   * Partition-parallel decode: the real pattern for media feature
   * extraction (one decoder instance per partition, streamed rows, no
   * driver involvement). Container headers (PNG IHDR / JPEG SOF) are
   * parsed for REAL — format, width, height from the actual bytes; the
   * fingerprint is the md5 of the post-header payload (container-stripped,
   * so byte-identical media dedups across containers). Bytes with no
   * parseable container fall back to [[StubDecoder]].
   */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("doc_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (codec contexts are
        // expensive; amortize across the partition)
        it.map { case (id, kind, bytes) =>
          ImageHeader.parse(bytes) match {
            case Some((fmt, w, h, hdrLen)) =>
              val md = java.security.MessageDigest.getInstance("MD5")
              md.update(bytes, hdrLen, bytes.length - hdrLen)
              MediaFeature(id, fmt, bytes.length.toLong, w, h,
                md.digest().map("%02x".format(_)).mkString)
            case None => StubDecoder.decode(id, kind, bytes)
          }
        }
      }
  }

  /**
   * Exact media dedup: group by the md5 of the raw content bytes — the
   * media-side counterpart of [[Dedup.exact]] (dedup by pixels/samples
   * happens pre-decode: identical bytes are identical media regardless of
   * codec). One hash-partitioned groupBy on a uniform 128-bit key; the
   * binary column itself never shuffles (only its digest does).
   */
  def dedupByContent(media: DataFrame): DataFrame =
    media.groupBy(md5(col("content")).as("content_fp"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("copies"),
        max(col("byte_len")).as("byte_len"))

  /**
   * PERCEPTUAL image near-dup (the gap exact [[dedupByContent]] leaves:
   * the same picture re-encoded — different filter strategy, different
   * deflate level, gray vs truecolor — has different bytes but identical
   * pixels). Pipeline: pure-JVM pixel decode (PNG via
   * [[PngCodec.decode]], baseline JPEG via [[JpegCodec.decode]] —
   * dispatched by magic bytes in [[mediaDHash]]) → 64-bit
   * dHash over the decoded grayscale ([[PngCodec.dHash64]]) → pigeonhole
   * block-LSH within hamming `maxHamming` ([[Dedup.hammingNearPairs]] —
   * k+1 blocks, candidates join on (block, value), exact bit_count(xor)
   * verify; never the doc² pair space). Undecodable payloads drop before
   * hashing. Only (doc_id, hash) shuffles — the binary column stays at
   * the scan.
   */
  /** Format dispatch for the perceptual hash: PNG or baseline JPEG by
    * magic bytes (each codec re-validates its own structure — the
    * dispatch only picks which decoder gets the first look). Every
    * format hashes through the SAME [[PngCodec.dHash64]] grid, so a
    * JPEG re-encode of a PNG's pixels collides at hamming 0. */
  def mediaDHash(bytes: Array[Byte]): Option[Long] =
    if (bytes != null && bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8) JpegCodec.dHashOf(bytes)
    else PngCodec.dHashOf(bytes)

  def phashSignatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        mediaDHash(bytes).map(h => (id, h))
      }).toDF("doc_id", "dhash")
  }

  /** Near-dup pairs (doc_a, doc_b, hamming ≤ maxHamming) over the
    * perceptual hashes. 64 bits must split into maxHamming+1 equal
    * blocks, so maxHamming ∈ {0, 1, 3, 7, 15, 31, 63}. */
  def phashNearDup(spark: SparkSession, media: DataFrame,
                   maxHamming: Int = 3): DataFrame =
    Dedup.hammingNearPairs(phashSignatures(spark, media),
      "doc_id", "dhash", maxHamming, bits = 64)

  /** Perceptual near-dup CLUSTERS — the keeper-selection form a dedup
    * pipeline actually drops rows with: connected components over the
    * [[phashNearDup]] pair graph ([[Dedup.connectedComponents]] — the
    * near-dup cliques are small, so the driver union-find fast path with
    * the distributed O(log d) fallback applies unchanged), every DECODED
    * doc mapped to its component's minimum id (singletons label
    * themselves; undecodable payloads have no hash and emit no row —
    * keep-or-quarantine is the caller's policy, not a hash). Returns
    * (doc_id, cluster_id); keep rows where doc_id = cluster_id. */
  def phashClusters(spark: SparkSession, media: DataFrame,
                    maxHamming: Int = 3): DataFrame = {
    val sig = phashSignatures(spark, media).localCheckpoint(false)
    val pairs = Dedup.hammingNearPairs(sig, "doc_id", "dhash",
      maxHamming, bits = 64).select(col("doc_a"), col("doc_b"))
    val labels = Dedup.connectedComponents(pairs)
    sig.select(col("doc_id"))
      .join(labels, col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
  }

  /**
   * Construction-predicting fixture for the perceptual pass: pixel
   * content is pure integer arithmetic over (group, variant) derived
   * from doc_id, so a SQL oracle reproduces the dHash without decoding
   * anything — while the Spark side must recover the same pixels through
   * the REAL codec path (zlib inflate, all five PNG filters, truecolor
   * luma). Per doc: v = doc_id % 3, g = (doc_id / 3) % groups; cell
   * (cy, cx) of a 9x8 grid has gray [[phashFixtureGray]], expanded to
   * 4x4 constant pixel blocks (36x32 image — box averages are exact).
   *   v=0: grayscale, deflate 6      — the original;
   *   v=1: truecolor r=g=b, deflate 9 — SAME pixels re-encoded (exact
   *        dedup misses it, hamming 0 catches it);
   *   v=2: one perturbed cell, deflate 1 — near-dup within hamming ≤ 2.
   * Every image cycles filter types 0-4 across its rows. doc_id % 11 = 0
   * rows carry a CRC-valid IDAT that fails zlib inflate — the malformed
   * shape the decoder must drop, predicted by the oracle as absent.
   */
  def phashFixtureGray(g: Long, v: Long, cy: Int, cx: Int): Int = {
    // quadratic mix — a LINEAR pattern in (g, cy, cx) makes adjacent
    // groups mere phase shifts of each other and their dHashes collide
    // within a few bits; squaring the term decorrelates the comparison
    // bits across groups (verified: zero cross-group pairs ≤ hamming 3)
    val t = g * 73 + cy * 9 + cx + 1
    val base = ((t * t * 13 + t * 7) % 251).toInt
    if (v == 2 && cy == (g % 8).toInt && cx == (g % 9).toInt) 250 - base
    else base
  }

  def phashFixtureMedia(spark: SparkSession, ids: DataFrame,
                        groups: Int): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long].map { id =>
      val content: Array[Byte] =
        if (id % 11 == 0) {
          // valid signature/IHDR/chunk CRCs, garbage deflate stream
          val junk = Array.tabulate[Byte](64)(i => ((i * 89 + 7) & 0xFF).toByte)
          val out = new java.io.ByteArrayOutputStream()
          val good = PngCodec.encode(Array.fill[Byte](36 * 32)(0), 36, 32, 0, _ => 0, 6)
          out.write(good, 0, 33) // signature + IHDR chunk
          val crc = new java.util.zip.CRC32()
          crc.update("IDAT".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          crc.update(junk)
          val bb = java.nio.ByteBuffer.allocate(12 + junk.length)
          bb.putInt(junk.length)
          bb.put("IDAT".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          bb.put(junk).putInt(crc.getValue.toInt)
          out.write(bb.array())
          val iend = java.nio.ByteBuffer.allocate(12)
          val ic = new java.util.zip.CRC32()
          ic.update("IEND".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          iend.putInt(0)
            .put("IEND".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
            .putInt(ic.getValue.toInt)
          out.write(iend.array())
          out.toByteArray
        } else {
          val v = id % 3; val g = (id / 3) % groups
          val (colorType, level) =
            if (v == 1) (2, 9) else if (v == 2) (0, 1) else (0, 6)
          val ch = if (colorType == 2) 3 else 1
          val px = new Array[Byte]((36 * 32) * ch)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 36) {
              val gray = phashFixtureGray(g, v, y / 4, x / 4).toByte
              var c = 0
              while (c < ch) { px((y * 36 + x) * ch + c) = gray; c += 1 }
              x += 1
            }
            y += 1
          }
          PngCodec.encode(px, 36, 32, colorType, r => r % 5, level)
        }
      (id, "image/png", content, content.length.toLong)
    }.toDF("doc_id", "kind", "content", "byte_len")
  }

  /**
   * The CROSS-CODEC twin of [[phashFixtureMedia]]: the same
   * construction-predicted grid values, but the re-encoded variants are
   * JPEGs — the exact gap the round-13 verdict named (a JPEG re-encode
   * of the same pixels survived both exact dedup and the PNG-only
   * perceptual pass). Per doc (v = doc_id % 3, g = (doc_id / 3) %
   * groups), cell (cy, cx) has gray [[phashFixtureGray]]:
   *   v=0: PNG grayscale, 36×32 (4×4 cells)           — the original;
   *   v=1: JPEG 4:2:0 color, 72×64 (8×8 cells), unit quant — the SAME
   *        grid re-encoded in a different CODEC (hamming 0: exact dedup
   *        misses it, the perceptual pass must not);
   *   v=2: JPEG grayscale, one perturbed cell         — near-dup ≤ 2.
   * Both shapes box-average exactly to the grid (constant cells), so
   * the SAME SQL oracle predicts every hash with no codec in sight.
   * doc_id % 11 = 0 rows are JPEGs with valid markers and a dead-end
   * entropy stream — the malformed shape that must drop before hashing.
   */
  def phashFixtureMediaJpeg(spark: SparkSession, ids: DataFrame,
                            groups: Int): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long].map { id =>
      val (kind, content): (String, Array[Byte]) =
        if (id % 11 == 0) {
          // valid SOI/DQT/SOF/DHT/SOS framing, then an entropy stream of
          // stuffed all-ones bytes: no 8-bit code 255 exists in the
          // encoder's tables, so Huffman decode dead-ends
          val good = JpegCodec.encode(Array.fill(72 * 64)(128), 72, 64,
            JpegCodec.Gray, JpegCodec.unitQuant)
          var i = 2
          while (!((good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xDA))
            i += 1
          val sosEnd = i + 2 + (((good(i + 2) & 0xFF) << 8) | (good(i + 3) & 0xFF))
          ("image/jpeg", good.take(sosEnd) ++
            Array.fill(24)(Array(0xFF.toByte, 0x00.toByte)).flatten ++
            Array(0xFF.toByte, 0xD9.toByte))
        } else {
          val v = id % 3; val g = (id / 3) % groups
          if (v == 0) {
            val px = new Array[Byte](36 * 32)
            var y = 0
            while (y < 32) {
              var x = 0
              while (x < 36) {
                px(y * 36 + x) = phashFixtureGray(g, v, y / 4, x / 4).toByte
                x += 1
              }
              y += 1
            }
            ("image/png", PngCodec.encode(px, 36, 32, 0, r => r % 5, 6))
          } else {
            val px = new Array[Int](72 * 64)
            var y = 0
            while (y < 64) {
              var x = 0
              while (x < 72) {
                px(y * 72 + x) = phashFixtureGray(g, v, y / 8, x / 8)
                x += 1
              }
              y += 1
            }
            val layout =
              if (v == 1) JpegCodec.Color420 else JpegCodec.Gray
            ("image/jpeg",
              JpegCodec.encode(px, 72, 64, layout, JpegCodec.unitQuant))
          }
        }
      (id, kind, content, content.length.toLong)
    }.toDF("doc_id", "kind", "content", "byte_len")
  }

  // ------------------------------------------------ video perceptual dedup

  /** Split an MJPEG-style sample stream (concatenated complete baseline
    * JPEGs — each sample its own SOI…EOI span) into frames. Safe on
    * encoder-produced streams: entropy data byte-stuffs FF as FF00 and
    * restart markers are FFD0–D7, so FFD8/FFD9 occur only as real
    * frame boundaries. Garbage between frames is skipped; an
    * unterminated trailing SOI is dropped (a truncated tail frame must
    * not hash). */
  private[graft] def splitJpegFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var i = 0
    while (i + 1 < payload.length) {
      if ((payload(i) & 0xFF) == 0xFF && (payload(i + 1) & 0xFF) == 0xD8) {
        var j = i + 2
        var end = -1
        while (end < 0 && j + 1 < payload.length) {
          if ((payload(j) & 0xFF) == 0xFF && (payload(j + 1) & 0xFF) == 0xD9)
            end = j + 2
          j += 1
        }
        if (end < 0) i = payload.length
        else { out += java.util.Arrays.copyOfRange(payload, i, end); i = end }
      } else i += 1
    }
    out.toSeq
  }

  /** Per-frame dHashes of a fixture/MJPEG video: container walk
    * ([[VideoHeader]]) → mdat → frame split → [[JpegCodec]] decode →
    * dHash. Uniform deterministic sampling caps the work at `maxFrames`
    * hashes per video regardless of duration (positions i·n/maxFrames —
    * re-derivable from the frame count alone, so two equal-length
    * videos always sample ALIGNED positions). A video with any
    * undecodable sampled frame is quarantined whole (None): a partial
    * signature would alias a shorter video's and produce false pairs. */
  private def videoFrameDHashes(bytes: Array[Byte],
                                maxFrames: Int): Option[Seq[Long]] = {
    val info = VideoHeader.parse(bytes).orNull
    if (info == null || info.mdatOffset < 0 || info.mdatLen <= 0 ||
      info.mdatOffset + info.mdatLen > bytes.length) return None
    val payload = java.util.Arrays.copyOfRange(bytes,
      info.mdatOffset.toInt, (info.mdatOffset + info.mdatLen).toInt)
    val frames = splitJpegFrames(payload)
    if (frames.isEmpty) return None
    val sampled =
      if (frames.length <= maxFrames) frames
      else (0 until maxFrames).map(i => frames((i * frames.length) / maxFrames))
    val hashes = sampled.map(JpegCodec.dHashOf)
    if (hashes.exists(_.isEmpty)) None else Some(hashes.map(_.get))
  }

  /** (doc_id, frame_idx, dhash) rows — the video twin of
    * [[phashSignatures]]; frame_idx is the 0-based SAMPLED position so
    * equal-length videos align positionally. `mapPartitions` only at the
    * byte-decode edge, like every other codec path here. */
  def videoPhashSignatures(spark: SparkSession, media: DataFrame,
                           maxFrames: Int = 8): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        videoFrameDHashes(bytes, maxFrames).toSeq.flatten.zipWithIndex
          .map { case (h, fi) => (id, fi, h) }
      }).toDF("doc_id", "frame_idx", "dhash")
  }

  /**
   * Perceptual VIDEO near-dup — re-encoded copies of the same footage
   * (different codec layout, same frames) and one-frame-perturbed
   * variants collide where exact content dedup misses them. Two videos
   * pair iff they sampled the SAME number of frames and EVERY aligned
   * frame pair is within `maxHamming` (the all-frames rule: a single
   * divergent frame means different footage, and "most frames match"
   * semantics would make the pair relation intransitive in a way no
   * downstream keeper rule can honor). Returns
   * (doc_a, doc_b, n_frames, max_hamming).
   *
   * Scale shape: candidates come from the SAME 4×16-bit pigeonhole
   * block join as the image path, keyed additionally by frame_idx —
   * sound for the all-frames rule (every aligned pair ≤ maxHamming ⟹
   * frame 0 alone pigeonholes into some equal block), and only 8-byte
   * keys shuffle. Verification joins hashes (not media bytes) for the
   * candidate pairs only.
   */
  def videoPhashNearDup(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 3,
                        maxFrames: Int = 8): DataFrame = {
    val blocks = maxHamming + 1
    require(64 % blocks == 0,
      s"maxHamming=$maxHamming: 64 bits must split into equal blocks")
    val width = 64 / blocks
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sig = videoPhashSignatures(spark, media, maxFrames)
      .localCheckpoint(false)
    val keyed = sig.select(col("doc_id"), col("frame_idx"),
      posexplode(array((0 until blocks).map(b =>
        shiftrightunsigned(col("dhash"), b * width)
          .bitwiseAND(lit(mask))): _*)).as(Seq("blk", "bval")))
    val cand = keyed.select(col("doc_id").as("doc_a"), col("frame_idx"),
      col("blk"), col("bval"))
      .join(keyed.select(col("doc_id").as("doc_b"), col("frame_idx"),
        col("blk"), col("bval")), Seq("frame_idx", "blk", "bval"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val counts = sig.groupBy(col("doc_id")).agg(count(lit(1)).as("__nf"))
    cand
      .join(sig.select(col("doc_id").as("doc_a"), col("frame_idx"),
        col("dhash").as("__ha")), Seq("doc_a"))
      .join(sig.select(col("doc_id").as("doc_b"), col("frame_idx"),
        col("dhash").as("__hb")), Seq("doc_b", "frame_idx"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("__aligned"),
        max(expr("bit_count(__ha ^ __hb)")).cast("int").as("max_hamming"))
      .join(counts.select(col("doc_id").as("doc_a"),
        col("__nf").as("__na")), Seq("doc_a"))
      .join(counts.select(col("doc_id").as("doc_b"),
        col("__nf").as("__nb")), Seq("doc_b"))
      .filter(col("__aligned") === col("__na") &&
        col("__aligned") === col("__nb") &&
        col("max_hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"),
        col("__aligned").cast("int").as("n_frames"), col("max_hamming"))
  }

  /**
   * Construction-predicting VIDEO fixture: real ISO-BMFF containers
   * ([[VideoHeader.mp4Bytes]]) whose mdat is four concatenated 72×64
   * unit-quant baseline JPEGs (MJPEG-style — each sample a complete
   * SOI…EOI frame). Frame fi of doc (v = id % 3, g = (id / 3) % groups)
   * carries the [[phashFixtureGray]] grid at group g·4+fi, so every
   * frame hash is SQL-predictable with no codec in sight:
   *   v=0: grayscale frames                 — the original;
   *   v=1: the SAME grids as 4:2:0 color    — re-encoded footage
   *        (hamming 0 per frame; exact dedup misses it);
   *   v=2: ONE frame (fi = g % 4) perturbed — near-dup ≤ 2 on that
   *        frame, 0 elsewhere.
   * id % 11 = 0: a valid container whose mdat is one dead-end-entropy
   * JPEG — the malformed shape; the video quarantines whole.
   */
  def videoPhashFixtureMedia(spark: SparkSession, ids: DataFrame,
                             groups: Int): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long].map { id =>
      val content: Array[Byte] =
        if (id % 11 == 0) {
          val good = JpegCodec.encode(Array.fill(72 * 64)(128), 72, 64,
            JpegCodec.Gray, JpegCodec.unitQuant)
          var i = 2
          while (!((good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xDA))
            i += 1
          val sosEnd = i + 2 +
            (((good(i + 2) & 0xFF) << 8) | (good(i + 3) & 0xFF))
          val bad = good.take(sosEnd) ++
            Array.fill(24)(Array(0xFF.toByte, 0x00.toByte)).flatten ++
            Array(0xFF.toByte, 0xD9.toByte)
          VideoHeader.mp4Bytes("isom", 1000, 4000L, 72, 64, v1 = false, bad)
        } else {
          val v = id % 3; val g = (id / 3) % groups
          val frames = (0 until 4).map { fi =>
            val vf = if (v == 2 && fi == (g % 4).toInt) 2L else 0L
            val px = new Array[Int](72 * 64)
            var y = 0
            while (y < 64) {
              var x = 0
              while (x < 72) {
                px(y * 72 + x) =
                  phashFixtureGray(g * 4 + fi, vf, y / 8, x / 8)
                x += 1
              }
              y += 1
            }
            JpegCodec.encode(px, 72, 64,
              if (v == 1) JpegCodec.Color420 else JpegCodec.Gray,
              JpegCodec.unitQuant)
          }
          VideoHeader.mp4Bytes("isom", 1000, 4000L, 72, 64, v1 = false,
            frames.reduce(_ ++ _))
        }
      (id, "video/mp4", content, content.length.toLong)
    }.toDF("doc_id", "kind", "content", "byte_len")
  }

  // ------------------------------------------------ persisted phash index

  /** The index's fixed pigeonhole geometry: 4 blocks × 16 bits (sound
    * for hamming ≤ 3 — k flipped bits cannot touch all k+1 blocks), and
    * the partition key `pb` = blk × 64 + the block value's top 6 bits
    * (4 × 64 = 256 dirs — the text index's ~320-dir lesson: few enough
    * dirs that discovery stays cheap, many enough that a fixed probe
    * batch prunes most of the corpus). Derived from the hash on BOTH
    * sides, so index and probe can never disagree on routing. */
  private[graft] def phashBlocksOf(sig: DataFrame): DataFrame =
    phashBlocks(sig)

  private def phashBlocks(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"), col("dhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("dhash"), b * 16)
          .bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("blk", "bval")))
      .withColumn("pb",
        (col("blk") * 64 + shiftright(col("bval"), 10)).cast("int"))

  /**
   * Persist a perceptual-hash INDEX over a media corpus — the
   * cross-corpus media-dedup shape at 100 TB: each decoded payload's
   * 64-bit dHash lands exploded per pigeonhole block, partitioned by
   * [[phashBlocks]]' `pb` dir, so probing a fixed batch reads only the
   * batch's candidate partitions (≤ 4 × batch distinct dirs of 256)
   * while the corpus — and its binary payloads, which never enter the
   * index at all — stays untouched. Undecodable payloads index nothing.
   */
  def buildPhashIndex(spark: SparkSession, media: DataFrame,
                      path: String): Unit =
    phashBlocks(phashSignatures(spark, media))
      .repartition(pbWriteTasks(spark), col("pb"))
      // bval-sorted row groups: the probe pushes its candidate values as
      // a bval filter, and parquet min/max stats skip the row groups a
      // sorted layout keeps tight — the id-sorted-row-groups device from
      // the dedup state verify
      .sortWithinPartitions(col("pb"), col("bval"))
      .write.mode("overwrite").partitionBy("pb").parquet(path)

  /** Shuffle-task count for a `pb`-partitioned index write: one task
    * per pb dir where the cluster has the cores (the 256-dir layout's
    * natural width), the core count where it does not — a hash
    * repartition on `pb` keyed wider than the cluster only queues
    * task-commit waves (a fixed 256 cost local 32-core builds ~1 s of
    * pure per-task commit latency), while fewer-than-256 tasks write
    * the SAME one file per touched dir through the sorted dynamic-
    * partition writer (`sortWithinPartitions(pb, …)` keeps a single
    * writer open). Scale-adaptive, never a local-only constant. */
  private def pbWriteTasks(spark: SparkSession): Int =
    math.max(1, math.min(256, spark.sparkContext.defaultParallelism))

  /** Append a media batch's signatures into the index's layout — one
    * dynamic-partition append, ≤ 1 new file per touched dir (bounded by
    * the batch, not the corpus). Same routing expressions as the build,
    * so probes see appended rows identically. */
  def appendToPhashIndex(spark: SparkSession, media: DataFrame,
                         path: String): Unit =
    phashBlocks(phashSignatures(spark, media))
      .repartition(math.max(1, spark.sparkContext.defaultParallelism),
        col("pb"))
      .sortWithinPartitions(col("pb"), col("bval"))
      .write.mode("append").partitionBy("pb").parquet(path)

  /**
   * COMPACT the phash index's accumulated small files — every
   * [[appendToPhashIndex]] (and every [[graft.streaming.StreamOps
   * .phashIngestTo]] epoch) adds ≤ 1 file per touched `pb` dir, and a
   * long-lived ingest path accumulates thousands (each a task + an
   * open-file cost per probe). Rewrites to ONE file per `pb` dir with
   * the bval-sorted row groups the probe's pushed-filter skipping
   * needs, via [[ParquetCompact]]'s staged-swap protocol (crash at any
   * window leaves a readable index; single-writer discipline like
   * every index mutator). Rows are untouched — probe results are
   * bit-identical before and after.
   *
   * Both layouts compact: a flat batch-built/append-maintained index
   * keeps its `pb=` tree; a streaming-ingest index (epoch dirs nested
   * INSIDE `pb=`) consolidates every epoch into the reserved
   * `__batch=-1`, after which the ingest's own epochs resume from the
   * stream's next micro-batch id ([[graft.streaming.StreamOps
   * .phashIngestTo]] — epoch N overwrites only its own partition, so
   * post-compaction writes cannot collide with the consolidated rows).
   * Returns the compacted row count.
   */
  def compactPhashIndex(spark: SparkSession, path: String): Long = {
    val hasEpochs = spark.read.parquet(path).columns.contains("__batch")
    if (hasEpochs)
      ParquetCompact.rewritePartitionedMulti(spark, path,
        Seq("pb", "__batch")) { df =>
        df.withColumn("__batch", lit(-1L))
          .repartition(col("pb"))
          .sortWithinPartitions(col("pb"), col("bval"))
      }
    else
      ParquetCompact.rewritePartitioned(spark, path, "pb") { df =>
        df.repartition(col("pb"))
          .sortWithinPartitions(col("pb"), col("bval"))
      }
  }

  /**
   * Dedup NEW media against the persisted index: decode + hash the
   * batch, read ONLY its candidate `pb` partitions (explicit subdirs —
   * the banded-index pruning device; ≤ 256 driver-side keys, metadata
   * scale), join candidates on exact (block, value) and verify with the
   * full 64-bit hamming. Returns (doc_id, corpus_id, hamming ≤
   * maxHamming) — every corpus near-dup of every batch doc.
   * `maxHamming` ≤ 3: the stored geometry is 4 blocks, sound up to 3.
   */
  def phashDedupAgainst(spark: SparkSession, path: String,
                        newMedia: DataFrame,
                        maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"the stored 4-block geometry is sound up to hamming 3, got $maxHamming")
    // a [[compactPhashIndex]] crash mid-swap leaves the live root
    // renamed away — heal it BEFORE the existence check, or the probe
    // would silently read "no index" as "no duplicates"
    ParquetCompact.recoverTable(spark, path)
    val sig = phashSignatures(spark, newMedia).localCheckpoint(false)
    val pblocks = phashBlocks(sig)
    val empty = sig.select(col("doc_id"), lit(0L).as("corpus_id"),
      lit(0).cast("int").as("hamming")).limit(0)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return empty
    // the batch's candidate keys, collected once: pb dirs to READ (≤ 256)
    // and bvals to PUSH as a scan filter (≤ 4 × batch) — with the
    // bval-sorted row groups the min/max stats skip everything a small
    // batch doesn't touch, keeping the probe's bytes bounded by the
    // batch even when its dirs span the whole layout
    val keys = pblocks.select(col("pb"), col("bval")).distinct().collect()
    val pbs = keys.map(_.getInt(0)).distinct
    val dirs = pbs.map(pb => new org.apache.hadoop.fs.Path(path, s"pb=$pb"))
      .filter(fs.exists(_)).map(_.toString)
    if (dirs.isEmpty) return empty
    val bvals = keys.map(_.getLong(1)).distinct.toIndexedSeq
    val corpus = spark.read.option("basePath", path)
      .parquet(dirs.toIndexedSeq: _*)
      .filter(col("bval").isin(bvals: _*))
      .select(col("doc_id").as("corpus_id"), col("dhash").as("__ch"),
        col("blk"), col("bval"))
    corpus
      .join(pblocks.select(col("doc_id"), col("dhash").as("__ph"),
        col("blk"), col("bval")), Seq("blk", "bval"))
      .select(col("doc_id"), col("corpus_id"),
        expr("bit_count(__ph ^ __ch)").cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------ persisted VIDEO phash index

  /** One row per DECODED video: (doc_id, n_frames, sig) with `sig` the
    * frame-ordered array of per-frame dHashes — the index's storable
    * signature form (≤ maxFrames longs; a video with any undecodable
    * sampled frame emits no row, the whole-video quarantine rule). */
  private def videoSigRows(spark: SparkSession, media: DataFrame,
                           maxFrames: Int): DataFrame =
    videoPhashSignatures(spark, media, maxFrames)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("frame_idx"),
        col("dhash")))).as("__s"))
      .select(col("doc_id"),
        size(col("__s")).cast("int").as("n_frames"),
        transform(col("__s"), e => e.getField("dhash")).as("sig"))

  /** Pigeonhole routing for whole-video signatures: blocks derive from
    * FRAME 0's hash only — sound for the all-frames rule (every aligned
    * frame within hamming ≤ 3 ⟹ frame 0 is, ⟹ frame 0 matches in some
    * block) — and each exploded row CARRIES the full signature array,
    * so verification reads nothing beyond the candidate rows (fetching
    * "all frames of doc X" from a per-frame layout would be a corpus
    * scan). Same 4 × 64 = 256 `pb` dir geometry as the image index. */
  private def videoSigBlocks(rows: DataFrame): DataFrame =
    rows.select(col("doc_id"), col("n_frames"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(element_at(col("sig"), 1), b * 16)
          .bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("blk", "bval")))
      .withColumn("pb",
        (col("blk") * 64 + shiftright(col("bval"), 10)).cast("int"))

  /** Persist a perceptual-hash index over a VIDEO corpus — signatures
    * land exploded per frame-0 pigeonhole block with the same
    * `pb`-partitioned, bval-sorted layout as [[buildPhashIndex]]; media
    * bytes never enter the index (≤ maxFrames longs per video do). */
  def buildVideoPhashIndex(spark: SparkSession, media: DataFrame,
                           path: String, maxFrames: Int = 8): Unit =
    videoSigBlocks(videoSigRows(spark, media, maxFrames))
      .repartition(pbWriteTasks(spark), col("pb"))
      .sortWithinPartitions(col("pb"), col("bval"))
      .write.mode("overwrite").partitionBy("pb").parquet(path)

  /** Append a video batch's signatures — same routing expressions as
    * the build, ≤ 1 new file per touched dir (bounded by the batch). */
  def appendToVideoPhashIndex(spark: SparkSession, media: DataFrame,
                              path: String, maxFrames: Int = 8): Unit =
    videoSigBlocks(videoSigRows(spark, media, maxFrames))
      .repartition(math.max(1, spark.sparkContext.defaultParallelism),
        col("pb"))
      .sortWithinPartitions(col("pb"), col("bval"))
      .write.mode("append").partitionBy("pb").parquet(path)

  /** The signature-blocks composition for the streaming ingest (the
    * [[phashBlocksOf]] device — StreamOps owns the epoch column). */
  private[graft] def videoSigBlocksOf(spark: SparkSession,
                                      media: DataFrame,
                                      maxFrames: Int = 8): DataFrame =
    videoSigBlocks(videoSigRows(spark, media, maxFrames))

  /** Compact the video index's accumulated append files to one
    * bval-sorted file per `pb` dir (probe bit-identical — same staged
    * swap as [[compactPhashIndex]]); a streaming-ingest index (epoch
    * dirs nested inside `pb=`) consolidates every epoch into the
    * reserved `__batch=-1`. Returns the row count. */
  def compactVideoPhashIndex(spark: SparkSession, path: String): Long = {
    val hasEpochs = spark.read.parquet(path).columns.contains("__batch")
    if (hasEpochs)
      ParquetCompact.rewritePartitionedMulti(spark, path,
        Seq("pb", "__batch")) { df =>
        df.withColumn("__batch", lit(-1L))
          .repartition(col("pb"))
          .sortWithinPartitions(col("pb"), col("bval"))
      }
    else
      ParquetCompact.rewritePartitioned(spark, path, "pb") { df =>
        df.repartition(col("pb"))
          .sortWithinPartitions(col("pb"), col("bval"))
      }
  }

  /**
   * Dedup NEW videos against the persisted index: decode + hash the
   * batch, read ONLY its candidate `pb` partitions with the batch's
   * bvals pushed as a scan filter (the [[phashDedupAgainst]] probe
   * shape), join candidates on exact frame-0 (block, value), and
   * verify the ALL-FRAMES rule entirely from the carried signature
   * arrays: equal frame counts AND every aligned frame within
   * `maxHamming`. Returns (doc_id, corpus_id, n_frames, max_hamming).
   */
  def videoPhashDedupAgainst(spark: SparkSession, path: String,
                             newMedia: DataFrame, maxHamming: Int = 3,
                             maxFrames: Int = 8): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"the stored 4-block geometry is sound up to hamming 3, got $maxHamming")
    ParquetCompact.recoverTable(spark, path)
    val sig = videoSigRows(spark, newMedia, maxFrames)
      .localCheckpoint(false)
    val pblocks = videoSigBlocks(sig)
    val empty = sig.select(col("doc_id"), lit(0L).as("corpus_id"),
      lit(0).as("n_frames"), lit(0).as("max_hamming")).limit(0)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return empty
    val keys = pblocks.select(col("pb"), col("bval")).distinct().collect()
    val pbs = keys.map(_.getInt(0)).distinct
    val dirs = pbs.map(pb => new org.apache.hadoop.fs.Path(path, s"pb=$pb"))
      .filter(fs.exists(_)).map(_.toString)
    if (dirs.isEmpty) return empty
    val bvals = keys.map(_.getLong(1)).distinct.toIndexedSeq
    val corpus = spark.read.option("basePath", path)
      .parquet(dirs.toIndexedSeq: _*)
      .filter(col("bval").isin(bvals: _*))
      .select(col("doc_id").as("corpus_id"),
        col("n_frames").as("__cn"), col("sig").as("__cs"),
        col("blk"), col("bval"))
    corpus
      .join(pblocks.select(col("doc_id"), col("n_frames"), col("sig"),
        col("blk"), col("bval")), Seq("blk", "bval"))
      .filter(col("n_frames") === col("__cn"))
      .select(col("doc_id"), col("corpus_id"), col("n_frames"),
        expr("aggregate(zip_with(sig, __cs, (a, b) -> bit_count(a ^ b)), " +
          "0, (acc, x) -> greatest(acc, x))").cast("int")
          .as("max_hamming"))
      .distinct()
      .filter(col("max_hamming") <= maxHamming)
  }

  // ------------------------------------------ persisted AUDIO phash index

  /** Pigeonhole routing for audio envelope hashes — [[phashBlocks]]'
    * geometry verbatim: the envelope hash is 64-bit like the image
    * dHash, so the same 4 × 16-bit blocks and 256 `pb` dirs carry the
    * hamming ≤ 3 soundness over unchanged. */
  private def audioSigBlocks(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"), col("ehash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("ehash"), b * 16)
          .bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("blk", "bval")))
      .withColumn("pb",
        (col("blk") * 64 + shiftright(col("bval"), 10)).cast("int"))

  /** The signature-blocks composition for the streaming ingest (the
    * [[phashBlocksOf]] device — StreamOps owns the epoch column). */
  private[graft] def audioSigBlocksOf(spark: SparkSession,
                                      media: DataFrame): DataFrame =
    audioSigBlocks(audioPhashSignatures(spark, media))

  /** Persist a perceptual-hash index over an AUDIO corpus — the last
    * modality without the build/append/compact/against/ingest
    * lifecycle (image: [[buildPhashIndex]], video:
    * [[buildVideoPhashIndex]]). Envelope hashes land exploded per
    * pigeonhole block in the same `pb`-partitioned, bval-sorted layout;
    * audio bytes never enter the index (8 bytes per decoded clip do).
    * Undecodable payloads (stereo, MP3, truncated RIFF) index nothing. */
  def buildAudioPhashIndex(spark: SparkSession, media: DataFrame,
                           path: String): Unit =
    audioSigBlocks(audioPhashSignatures(spark, media))
      .repartition(pbWriteTasks(spark), col("pb"))
      .sortWithinPartitions(col("pb"), col("bval"))
      .write.mode("overwrite").partitionBy("pb").parquet(path)

  /** Append an audio batch's signatures — same routing expressions as
    * the build, ≤ 1 new file per touched dir (bounded by the batch). */
  def appendToAudioPhashIndex(spark: SparkSession, media: DataFrame,
                              path: String): Unit =
    audioSigBlocks(audioPhashSignatures(spark, media))
      .repartition(math.max(1, spark.sparkContext.defaultParallelism),
        col("pb"))
      .sortWithinPartitions(col("pb"), col("bval"))
      .write.mode("append").partitionBy("pb").parquet(path)

  /** Compact the audio index's accumulated append files to one
    * bval-sorted file per `pb` dir (probe bit-identical — same staged
    * swap as [[compactPhashIndex]]); a streaming-ingest index (epoch
    * dirs nested inside `pb=`) consolidates every epoch into the
    * reserved `__batch=-1`. Returns the row count. */
  def compactAudioPhashIndex(spark: SparkSession, path: String): Long = {
    val hasEpochs = spark.read.parquet(path).columns.contains("__batch")
    if (hasEpochs)
      ParquetCompact.rewritePartitionedMulti(spark, path,
        Seq("pb", "__batch")) { df =>
        df.withColumn("__batch", lit(-1L))
          .repartition(col("pb"))
          .sortWithinPartitions(col("pb"), col("bval"))
      }
    else
      ParquetCompact.rewritePartitioned(spark, path, "pb") { df =>
        df.repartition(col("pb"))
          .sortWithinPartitions(col("pb"), col("bval"))
      }
  }

  /**
   * Dedup NEW audio against the persisted index: decode + envelope-hash
   * the batch, read ONLY its candidate `pb` partitions with the batch's
   * bvals pushed as a scan filter (the [[phashDedupAgainst]] probe
   * shape), join candidates on exact (block, value) and verify with the
   * full 64-bit hamming. Returns (doc_id, corpus_id, hamming ≤
   * maxHamming). `maxHamming` ≤ 3: the stored 4-block geometry's bound.
   */
  def audioPhashDedupAgainst(spark: SparkSession, path: String,
                             newMedia: DataFrame,
                             maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"the stored 4-block geometry is sound up to hamming 3, got $maxHamming")
    ParquetCompact.recoverTable(spark, path)
    val sig = audioPhashSignatures(spark, newMedia).localCheckpoint(false)
    val pblocks = audioSigBlocks(sig)
    val empty = sig.select(col("doc_id"), lit(0L).as("corpus_id"),
      lit(0).cast("int").as("hamming")).limit(0)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return empty
    val keys = pblocks.select(col("pb"), col("bval")).distinct().collect()
    val pbs = keys.map(_.getInt(0)).distinct
    val dirs = pbs.map(pb => new org.apache.hadoop.fs.Path(path, s"pb=$pb"))
      .filter(fs.exists(_)).map(_.toString)
    if (dirs.isEmpty) return empty
    val bvals = keys.map(_.getLong(1)).distinct.toIndexedSeq
    val corpus = spark.read.option("basePath", path)
      .parquet(dirs.toIndexedSeq: _*)
      .filter(col("bval").isin(bvals: _*))
      .select(col("doc_id").as("corpus_id"), col("ehash").as("__ch"),
        col("blk"), col("bval"))
    corpus
      .join(pblocks.select(col("doc_id"), col("ehash").as("__ph"),
        col("blk"), col("bval")), Seq("blk", "bval"))
      .select(col("doc_id"), col("corpus_id"),
        expr("bit_count(__ph ^ __ch)").cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * PERCEPTUAL audio near-dup — the audio counterpart of the dHash pass:
   * the same recording re-encoded (8-bit vs 16-bit PCM, different
   * container padding) has different bytes but the same LOUDNESS SHAPE.
   * [[audioEnvelopeHash]] decodes real WAV PCM (mono, 8/16-bit — the
   * RIFF walk is [[AudioHeader]]'s), box-averages per-sample amplitude
   * into 65 windows (floor-boundary, integer mean — the dHash grid
   * device in one dimension), and sets bit i iff env(i) > env(i+1).
   * Comparisons are SCALE-INVARIANT: any linear gain change preserves
   * the envelope ordering, and a 16-bit encode of 8-bit content
   * (sample16 = sample8 << 8) hashes IDENTICALLY because amplitudes
   * normalize to the 8-bit scale (|s16| >> 8). Stereo, MP3 (no PCM
   * without a codec), non-PCM widths, and anything malformed return
   * None and drop before hashing.
   */
  def audioEnvelopeHash(bytes: Array[Byte]): Option[Long] = {
    val info = AudioHeader.parse(bytes).getOrElse(return None)
    if (info.format != "audio/wav" || info.channels != 1 ||
      (info.bitsPerSample != 8 && info.bitsPerSample != 16)) return None
    val bpS = info.bitsPerSample / 8
    val n = (info.dataLen / bpS).toInt
    if (n < 65 || info.headerLen + n.toLong * bpS > bytes.length) return None
    def amp(i: Int): Int =
      if (bpS == 1) math.abs((bytes(info.headerLen + i) & 0xFF) - 128)
      else {
        val s = (((bytes(info.headerLen + 2 * i + 1) & 0xFF) << 8) |
          (bytes(info.headerLen + 2 * i) & 0xFF)).toShort
        math.abs(s.toInt) >> 8
      }
    val env = new Array[Long](65)
    var w = 0
    while (w < 65) {
      val i0 = w * n / 65; val i1 = (w + 1) * n / 65
      var s = 0L; var i = i0
      while (i < i1) { s += amp(i); i += 1 }
      env(w) = s / (i1 - i0)
      w += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (env(i) > env(i + 1)) hash |= 1L << i
      i += 1
    }
    Some(hash)
  }

  /** (doc_id, ehash) for every decodable payload — the audio twin of
    * [[phashSignatures]]. */
  def audioPhashSignatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        audioEnvelopeHash(bytes).map(h => (id, h))
      }).toDF("doc_id", "ehash")
  }

  /** Near-dup pairs within hamming `maxHamming` over the audio envelope
    * hashes — same pigeonhole block-LSH as the image pass. */
  def audioPhashNearDup(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 3): DataFrame =
    Dedup.hammingNearPairs(audioPhashSignatures(spark, media),
      "doc_id", "ehash", maxHamming, bits = 64)

  /** Near-dup CLUSTERS over the audio envelope hashes — the
    * keeper-selection form ([[phashClusters]] for the audio modality):
    * connected components over the hamming-bounded pair graph, every
    * decodable clip labeled (singletons label themselves), undecodable
    * clips emit nothing. */
  def audioPhashClusters(spark: SparkSession, media: DataFrame,
                         maxHamming: Int = 3): DataFrame = {
    val sig = audioPhashSignatures(spark, media).localCheckpoint(false)
    val pairs = Dedup.hammingNearPairs(sig, "doc_id", "ehash",
      maxHamming, bits = 64).select(col("doc_a"), col("doc_b"))
    val labels = Dedup.connectedComponents(pairs)
    sig.select(col("doc_id"))
      .join(labels, col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
  }

  /**
   * Construction-predicting audio fixture (the [[phashFixtureMedia]]
   * device in one dimension): per doc v = doc_id % 3,
   * g = (doc_id / 3) % groups; window w of 65 has amplitude
   * [[audioPhashFixtureEnv]] (4 constant samples per window, 260
   * samples — box means are the window values exactly).
   *   v=0: 8-bit PCM               — the original;
   *   v=1: 16-bit PCM, SAME shape  — re-encoded (bytes differ, hash 0);
   *   v=2: one perturbed window    — near-dup within hamming ≤ 2.
   * doc_id % 11 rows are truncated mid-data-chunk — the RIFF walk
   * rejects the overrun and the row must drop, predicted absent by the
   * oracle.
   */
  def audioPhashFixtureEnv(g: Long, v: Long, w: Int): Int = {
    val t = g * 91 + w + 1
    val base = ((t * t * 17 + t * 3) % 120).toInt
    if (v == 2 && w == (g % 65).toInt) 119 - base else base
  }

  def audioPhashFixtureMedia(spark: SparkSession, ids: DataFrame,
                             groups: Int): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long].map { id =>
      val v = id % 3; val g = (id / 3) % groups
      val bits = if (v == 1) 16 else 8
      val samples = new Array[Byte](260 * (bits / 8))
      var w = 0
      while (w < 65) {
        val a = audioPhashFixtureEnv(g, v, w)
        var i = 0
        while (i < 4) {
          val s = w * 4 + i
          if (bits == 8) samples(s) = (128 + a).toByte
          else {
            val s16 = a * 256
            samples(2 * s) = (s16 & 0xFF).toByte
            samples(2 * s + 1) = ((s16 >> 8) & 0xFF).toByte
          }
          i += 1
        }
        w += 1
      }
      val wav = AudioHeader.wavBytes(1, 8000, bits, samples)
      val content = if (id % 11 == 0) wav.dropRight(10) else wav
      (id, "audio/wav", content, content.length.toLong)
    }.toDF("doc_id", "kind", "content", "byte_len")
  }

  /**
   * Resize / downsample stub: keep every k-th token of the payload — the
   * deterministic stand-in for image resize / audio downsampling (the
   * real kernel would run in [[decodeFeatures]]'s partition loop; the
   * Spark-side shape — payload in, smaller payload + metadata out — is
   * what this exercises).
   */
  def downsample(payload: Column, k: Int): Column =
    array_join(filter(split(payload, " "), (_, i) => i % k === 0), " ")

  /**
   * Frame sampling: split the payload into fixed-size frames and emit
   * (doc_id, frame_idx, frame_hash) — pure Column work, fully codegen'd.
   * Stands in for video frame extraction / audio windowing. `payload` is
   * the string view of the content (the fixture media is utf-8 text).
   */
  def sampleFrames(df: DataFrame, idCol: String, payload: Column,
                   frameBytes: Int = 64): DataFrame =
    df.withColumn("__n", floor(length(payload) / frameBytes))
      .filter(col("__n") > 0)
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(transform(sequence(lit(0), col("__n") - 1),
          i => md5(payload.substr(i * frameBytes + 1, lit(frameBytes)))))
          .as(Seq("frame_idx", "frame_hash")))
}
