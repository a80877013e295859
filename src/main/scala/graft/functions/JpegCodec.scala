package graft.functions

/**
 * Pure-JVM baseline JPEG (JFIF) pixel codec — the round-13 verdict's
 * top gap: the dominant crawl image format was invisible to the
 * perceptual near-dup pass because [[PngCodec]] was the only pixel
 * path, so a JPEG re-encode of the same pixels survived both exact
 * content dedup AND the dHash pass. Decodes baseline-sequential
 * Huffman JPEG (ITU T.81 / JFIF) to the GRAYSCALE plane with no AWT
 * and no native codec, so the decode runs inside executor
 * `mapPartitions` loops with zero library risk.
 *
 * Gray IS the Y plane: JFIF's Y component is exactly BT.601 luma
 * scaled to 0–255, which is what [[PngCodec.dHash64]] consumes — so
 * the decoder IDCTs ONLY the Y blocks and entropy-skips the chroma
 * coefficients (they must still be Huffman-decoded to advance the
 * bitstream and the DC predictors, but never dequantized or
 * transformed). No chroma upsampling exists anywhere: the Y plane is
 * always full resolution regardless of 4:4:4 / 4:2:2 / 4:2:0.
 *
 * Scope guard (the PngCodec pattern — out-of-scope means None, never
 * garbage): SOF0 baseline only (progressive SOF2, extended SOF1,
 * arithmetic SOF9+/DAC, lossless, hierarchical all rejected), 8-bit
 * samples, 1 or 3 components, sampling factors 1–2 with Y at the MCU
 * maximum, 8-bit quant tables, single interleaved scan (Ss=0 Se=63
 * Ah=Al=0), restart markers honored. Structural damage — bad marker
 * framing, Huffman table overflow, bitstream exhaustion mid-block,
 * missing EOI — decodes to None. The same 16M-pixel header cap as the
 * PNG decoder bounds allocation before any entropy data is trusted.
 *
 * The encoder exists for fixtures and tests (the PngCodec device): it
 * produces real spec-conformant baseline JPEGs — markers, DQT/DHT,
 * forward DCT, canonical Huffman, byte stuffing, restart-free single
 * scan — with caller-chosen quant tables and layout (grayscale,
 * 4:4:4 color, 4:2:0 color). With an all-ones quant table, an image
 * whose 8×8 blocks are each CONSTANT round-trips exactly: the only
 * nonzero coefficient is DC = 8·(c−128), and the IDCT reproduces c to
 * well under half a gray level — which is what lets a SQL oracle
 * predict the decoded pixels (and the dHash) from the construction
 * arithmetic without ever running a codec. Determinism: the DCT basis
 * is precomputed with StrictMath (bit-identical on every JVM) and all
 * rounding is integer.
 *
 * Reference behavior anchor: the reference engine ships no media
 * code at all (see SURVEY §2.6 — this is part of the LLM-pipeline
 * extension set); the format itself is public spec (ITU T.81).
 */
object JpegCodec {

  /** Decoded image: grayscale pixels (0–255) row-major — the Y plane. */
  final case class Decoded(width: Int, height: Int, gray: Array[Int])

  /** Zigzag index k → natural (row-major) position, T.81 figure A.6. */
  private[functions] val Zig: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // Shared DCT basis: ct(u)(x) = C(u)/2 · cos((2x+1)uπ/16). The 2-D
  // kernel ct(u,x)·ct(v,y) carries the full 1/4·C(u)C(v) normalization,
  // so the SAME table drives both directions (F = Σ f·ct·ct and
  // f = Σ F·ct·ct). StrictMath: bit-identical across JVMs.
  private val Ct: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    0.5 * c * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }

  // ------------------------------------------------------------- huffman

  /** Canonical Huffman table from a DHT payload (16 length counts +
    * symbols). Construction validates the Kraft bound as it goes: a
    * code value overflowing its bit length means a corrupt table. */
  private final class Huff private (val counts: Array[Int],
                                    val symbols: Array[Int],
                                    val minCode: Array[Int],
                                    val maxCode: Array[Int],
                                    val valPtr: Array[Int]) {
    /** Next symbol off the bit reader, or -1 on any structural error. */
    def decode(br: BitReader): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val b = br.nextBit()
        if (b < 0) return -1
        code = (code << 1) | b
        if (counts(l - 1) > 0 && code >= minCode(l) && code <= maxCode(l))
          return symbols(valPtr(l) + code - minCode(l))
        l += 1
      }
      -1
    }
  }

  private object Huff {
    def build(counts: Array[Int], symbols: Array[Int]): Option[Huff] = {
      val minCode = new Array[Int](17)
      val maxCode = new Array[Int](17)
      val valPtr = new Array[Int](17)
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = code - 1
        if (code > (1 << l)) return None // Kraft overflow: corrupt table
        code <<= 1
        l += 1
      }
      if (k != symbols.length) return None
      Some(new Huff(counts, symbols, minCode, maxCode, valPtr))
    }
  }

  /** MSB-first bit reader over entropy-coded data with JPEG byte
    * stuffing (FF 00 → literal FF). Any real marker stops the stream:
    * nextBit returns -1 and `pos` is left ON the FF so the caller can
    * consume RST / EOI markers explicitly. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    var atMarker = false

    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (atMarker || pos >= bytes.length) return -1
        var b = bytes(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= bytes.length) { atMarker = true; pos -= 1; return -1 }
          val m = bytes(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed FF
          else { atMarker = true; pos -= 1; return -1 }
        }
        bitBuf = b
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    /** Read `n` magnitude bits (0 ≤ n ≤ 16), or -1 on error. */
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = nextBit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }

    /** Drop to the next byte boundary (restart-marker alignment). */
    def align(): Unit = bitCnt = 0

    /** Consume an expected two-byte marker at the current position
      * (after align); true on success. */
    def takeMarker(expected: Int): Boolean = {
      if (pos + 1 >= bytes.length) return false
      if ((bytes(pos) & 0xFF) != 0xFF ||
        (bytes(pos + 1) & 0xFF) != expected) return false
      pos += 2
      atMarker = false
      true
    }
  }

  /** T.81 EXTEND: map `v` (the raw `t` magnitude bits) to its signed
    * value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // --------------------------------------------------------------- decode

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Int = -1
    var acTable: Int = -1
  }

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)

  /**
   * Decode a baseline-sequential JFIF JPEG to its grayscale (Y) plane.
   * Anything outside the documented scope, and any structural damage,
   * returns None — a corrupt crawl payload must never contribute a
   * perceptual hash.
   */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None

    val quant = new Array[Array[Int]](4) // zigzag order, per table id
    val dcHuff = new Array[Huff](4)
    val acHuff = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var dri = 0
    var scanStart = -1

    var p = 2
    while (scanStart < 0) {
      // marker framing: one or more FF fill bytes, then the marker id
      if (p >= bytes.length) return None
      if ((bytes(p) & 0xFF) != 0xFF) return None
      while (p < bytes.length && (bytes(p) & 0xFF) == 0xFF) p += 1
      if (p >= bytes.length) return None
      val marker = bytes(p) & 0xFF
      p += 1
      marker match {
        case 0xD8 | 0xD9 => return None // SOI again / EOI before SOS
        case m if m >= 0xD0 && m <= 0xD7 => return None // RST outside scan
        case 0x01 => () // TEM: standalone, no payload
        case _ =>
          if (p + 2 > bytes.length) return None
          val len = be16(bytes, p)
          if (len < 2 || p + len > bytes.length) return None
          val seg = p + 2
          val segEnd = p + len
          marker match {
            case 0xC0 => // SOF0 — the only accepted frame type
              if (comps != null) return None
              if (len < 8) return None
              val precision = bytes(seg) & 0xFF
              h = be16(bytes, seg + 1)
              w = be16(bytes, seg + 3)
              val nf = bytes(seg + 5) & 0xFF
              // the PNG decoder's allocation bound: the Y plane
              // allocates from the header's claim before any entropy
              // data validates, so cap it the same way
              if (precision != 8 || w <= 0 || h <= 0 ||
                w > (1 << 20) || h > (1 << 20) ||
                w.toLong * h > (1L << 24)) return None
              if (nf != 1 && nf != 3) return None
              if (len != 8 + 3 * nf) return None
              comps = Array.tabulate(nf) { i =>
                val o = seg + 6 + 3 * i
                Component(bytes(o) & 0xFF, (bytes(o + 1) & 0xFF) >> 4,
                  bytes(o + 1) & 0x0F, bytes(o + 2) & 0xFF)
              }
              if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 ||
                c.v > 2 || c.tq > 3)) return None
              // Y must carry the MCU-maximum sampling or its blocks
              // would not tile the full-resolution gray plane
              if (nf == 3 && (comps(0).h < comps.map(_.h).max ||
                comps(0).v < comps.map(_.v).max)) return None
            case 0xC4 => // DHT: one or more tables
              var o = seg
              while (o < segEnd) {
                if (o + 17 > segEnd) return None
                val tc = (bytes(o) & 0xFF) >> 4
                val th = bytes(o) & 0x0F
                if (tc > 1 || th > 3) return None
                val counts = Array.tabulate(16)(i => bytes(o + 1 + i) & 0xFF)
                val n = counts.sum
                if (n == 0 || n > 256 || o + 17 + n > segEnd) return None
                val syms = Array.tabulate(n)(i => bytes(o + 17 + i) & 0xFF)
                val huff = Huff.build(counts, syms).getOrElse(return None)
                if (tc == 0) dcHuff(th) = huff else acHuff(th) = huff
                o += 17 + n
              }
            case 0xDB => // DQT: one or more 8-bit tables (zigzag order)
              var o = seg
              while (o < segEnd) {
                val pq = (bytes(o) & 0xFF) >> 4
                val tq = bytes(o) & 0x0F
                if (pq != 0 || tq > 3 || o + 65 > segEnd) return None
                quant(tq) = Array.tabulate(64)(i => bytes(o + 1 + i) & 0xFF)
                if (quant(tq).exists(_ == 0)) return None
                o += 65
              }
            case 0xDD => // DRI
              if (len != 4) return None
              dri = be16(bytes, seg)
            case 0xDA => // SOS — baseline single interleaved scan
              if (comps == null) return None
              val ns = bytes(seg) & 0xFF
              if (ns != comps.length || len != 6 + 2 * ns) return None
              var i = 0
              while (i < ns) {
                val cs = bytes(seg + 1 + 2 * i) & 0xFF
                val c = comps.find(_.id == cs).getOrElse(return None)
                c.dcTable = (bytes(seg + 2 + 2 * i) & 0xFF) >> 4
                c.acTable = bytes(seg + 2 + 2 * i) & 0x0F
                // nibbles range 0–15 but only 4 table slots exist —
                // unvalidated ids indexed out of bounds (fuzz-found)
                if (c.dcTable > 3 || c.acTable > 3) return None
                i += 1
              }
              val ss = bytes(seg + 1 + 2 * ns) & 0xFF
              val se = bytes(seg + 2 + 2 * ns) & 0xFF
              val ahal = bytes(seg + 3 + 2 * ns) & 0xFF
              if (ss != 0 || se != 63 || ahal != 0) return None
              scanStart = segEnd
            case m if (m >= 0xC1 && m <= 0xCF) || m == 0xDC || m == 0xDE ||
              m == 0xDF =>
              // SOF1/2/…, DAC, DNL, DHP, EXP: extended / progressive /
              // arithmetic / hierarchical — out of scope by design
              return None
            case m if (m >= 0xE0 && m <= 0xEF) || m == 0xFE =>
              () // APPn / COM: metadata, skipped
            case _ => return None
          }
          p = segEnd
      }
    }
    if (comps == null || w == 0) return None
    // every referenced table must exist before any entropy bit is read
    comps.foreach { c =>
      if (c.tq > 3 || quant(c.tq) == null) return None
      if (c.dcTable < 0 || dcHuff(c.dcTable) == null ||
        acHuff(c.acTable) == null) return None
    }

    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    // single-component scans are non-interleaved: the MCU is one block
    // and the declared sampling factors do not shape the geometry
    val (mcusX, mcusY) =
      if (comps.length == 1) ((w + 7) / 8, (h + 7) / 8)
      else ((w + 8 * hmax - 1) / (8 * hmax), (h + 8 * vmax - 1) / (8 * vmax))

    val gray = new Array[Int](w * h)
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val out = new Array[Int](64)
    val tmp = new Array[Double](64)
    val br = new BitReader(bytes, scanStart)

    /** Huffman-decode one block's coefficients; dequantize + IDCT only
      * when `place` (the Y plane) — chroma advances the stream and its
      * DC predictor, nothing more. False on any bitstream error. */
    def block(ci: Int, place: Boolean, px0: Int, py0: Int): Boolean = {
      val c = comps(ci)
      val q = quant(c.tq)
      val t = dcHuff(c.dcTable).decode(br)
      if (t < 0 || t > 11) return false
      val diffBits = br.bits(t)
      if (diffBits < 0) return false
      dcPred(ci) += extend(diffBits, t)
      if (place) {
        java.util.Arrays.fill(coef, 0)
        coef(0) = dcPred(ci) * q(0)
      }
      var k = 1
      while (k < 64) {
        val rs = acHuff(c.acTable).decode(br)
        if (rs < 0) return false
        val r = rs >> 4
        val s = rs & 0x0F
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else k = 64 // EOB
        } else {
          k += r
          if (k > 63 || s > 10) return false
          val vb = br.bits(s)
          if (vb < 0) return false
          if (place) coef(Zig(k)) = extend(vb, s) * q(k)
          k += 1
        }
      }
      if (!place) return true
      // separable IDCT: rows over u, then columns over v; +128 level
      // shift, round, clamp — deterministic double arithmetic (Ct is
      // StrictMath-built)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s2 = 0.0
          var u = 0
          while (u < 8) { s2 += Ct(u)(x) * coef(y * 8 + u); u += 1 }
          tmp(y * 8 + x) = s2
          x += 1
        }
        y += 1
      }
      var x = 0
      while (x < 8) {
        var yy = 0
        while (yy < 8) {
          var s2 = 0.0
          var v = 0
          while (v < 8) { s2 += Ct(v)(yy) * tmp(v * 8 + x); v += 1 }
          val g = Math.round(s2 + 128.0).toInt
          out(yy * 8 + x) = if (g < 0) 0 else if (g > 255) 255 else g
          yy += 1
        }
        x += 1
      }
      // clip-place into the gray plane (edge MCUs overhang the image)
      var py = 0
      while (py < 8) {
        val gy = py0 + py
        if (gy < h) {
          var px = 0
          while (px < 8) {
            val gx = px0 + px
            if (gx < w) gray(gy * w + gx) = out(py * 8 + px)
            px += 1
          }
        }
        py += 1
      }
      true
    }

    var mcu = 0
    var rst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          br.align()
          if (!br.takeMarker(0xD0 | rst)) return None
          rst = (rst + 1) & 7
          java.util.Arrays.fill(dcPred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val (ch, cv) = if (comps.length == 1) (1, 1) else (c.h, c.v)
          var bv = 0
          while (bv < cv) {
            var bh = 0
            while (bh < ch) {
              val isY = ci == 0
              if (!block(ci, isY, (mx * ch + bh) * 8, (my * cv + bv) * 8))
                return None
              bh += 1
            }
            bv += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // the stream must close with EOI right after the (byte-aligned)
    // entropy data — anything else is structural damage
    br.align()
    if (!br.takeMarker(0xD9)) return None
    Some(Decoded(w, h, gray))
  }

  /** decode + dHash in one step — the per-row executor path (the
    * [[PngCodec.dHashOf]] twin; the hash arithmetic is shared). */
  def dHashOf(bytes: Array[Byte]): Option[Long] =
    decode(bytes).flatMap(d => PngCodec.dHash64(d.gray, d.width, d.height))

  // --------------------------------------------------------------- encode

  /** Encoder layouts: grayscale (1 component), YCbCr 4:4:4, YCbCr
    * 4:2:0. Chroma is encoded as CONSTANT 128 (zero chroma) — the
    * encoder's job is byte-different re-encodes of known gray pixels,
    * not color fidelity. */
  sealed trait Layout
  case object Gray extends Layout
  case object Color444 extends Layout
  case object Color420 extends Layout

  // Encoder Huffman tables: original fixed-length canonical tables (NOT
  // the T.81 Annex K ones — compression is irrelevant for fixtures and
  // simplicity wins). DC: the 12 category symbols at 5 bits each
  // (codes 0–11). AC: EOB, ZRL, then (run 0–15 × size 1–10) at 8 bits
  // each — 162 symbols, codes 0–161; no code is all-ones. The decoder
  // rebuilds these canonically from the DHT like any other table.
  private val EncDcCounts: Array[Int] =
    Array(0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncDcSyms: Array[Int] = Array.tabulate(12)(identity)
  private val EncAcCounts: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncAcSyms: Array[Int] =
    Array(0x00, 0xF0) ++
      (for (r <- 0 until 16; s <- 1 to 10) yield (r << 4) | s)

  private def acCode(rs: Int): Int =
    if (rs == 0x00) 0
    else if (rs == 0xF0) 1
    else 2 + (rs >> 4) * 10 + ((rs & 0x0F) - 1)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xFF) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 convention). */
    def flush(): Unit = if (cnt > 0) { put(0xFF, 8 - cnt) }
  }

  /** Magnitude category of a coefficient (0–11). */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  /** Forward DCT + quantize one level-shifted spatial block into
    * zigzag-ordered quantized coefficients. */
  private def fdctQuant(f: Array[Double], q: Array[Int]): Array[Int] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += Ct(u)(x) * f(y * 8 + x); x += 1 }
        t(u * 8 + y) = s
        y += 1
      }
      u += 1
    }
    val zz = new Array[Int](64)
    var k = 0
    while (k < 64) {
      val nat = Zig(k)
      val uu = nat % 8 // natural index = v*8+u with u horizontal
      val vv = nat / 8
      var s = 0.0
      var y = 0
      while (y < 8) { s += Ct(vv)(y) * t(uu * 8 + y); y += 1 }
      zz(k) = Math.round(s / q(k)).toInt
      k += 1
    }
    zz
  }

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int,
                  payload: Array[Byte]): Unit = {
    out.write(0xFF); out.write(marker)
    out.write((payload.length + 2) >> 8); out.write((payload.length + 2) & 0xFF)
    out.write(payload, 0, payload.length)
  }

  /**
   * Encode gray pixels (0–255 row-major) as a real baseline JPEG.
   * `quant` is the 64-entry quant table in ZIGZAG order (all-ones for
   * the exact-round-trip fixture shape); color layouts write constant
   * zero chroma so the decoded Y equals the input gray. 4:2:0 pads
   * edge blocks by edge replication, exercising partial-MCU decode.
   * `restartInterval` > 0 writes a DRI segment and RSTn markers every
   * that many MCUs (predictor resets included) — the decoder's restart
   * path needs a real producer to be testable.
   */
  def encode(gray: Array[Int], w: Int, h: Int, layout: Layout,
             quant: Array[Int], restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h, s"bad dims $w x $h")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant must be 64 values in 1..255")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8) // SOI
    // JFIF APP0 (identifies the stream; decoders skip it)
    seg(out, 0xE0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT table 0
    seg(out, 0xDB, Array(0.toByte) ++ quant.map(_.toByte))
    // SOF0
    val ncomp = if (layout == Gray) 1 else 3
    val (yh, yv) = layout match {
      case Color420 => (2, 2)
      case _ => (1, 1)
    }
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8) // precision
    sof.write(h >> 8); sof.write(h & 0xFF)
    sof.write(w >> 8); sof.write(w & 0xFF)
    sof.write(ncomp)
    sof.write(1); sof.write((yh << 4) | yv); sof.write(0) // Y
    if (ncomp == 3) {
      sof.write(2); sof.write(0x11); sof.write(0) // Cb 1x1
      sof.write(3); sof.write(0x11); sof.write(0) // Cr 1x1
    }
    seg(out, 0xC0, sof.toByteArray)
    // DHT: DC table 0 + AC table 0 (used by all components)
    val dht = new java.io.ByteArrayOutputStream()
    dht.write(0x00); EncDcCounts.foreach(dht.write)
    EncDcSyms.foreach(dht.write)
    dht.write(0x10); EncAcCounts.foreach(dht.write)
    EncAcSyms.foreach(dht.write)
    seg(out, 0xC4, dht.toByteArray)
    if (restartInterval > 0)
      seg(out, 0xDD,
        Array(((restartInterval >> 8) & 0xFF).toByte,
          (restartInterval & 0xFF).toByte))
    // SOS
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(ncomp)
    var i = 1
    while (i <= ncomp) { sos.write(i); sos.write(0x00); i += 1 }
    sos.write(0); sos.write(63); sos.write(0)
    seg(out, 0xDA, sos.toByteArray)

    val bw = new BitWriter(out)
    val dcPred = new Array[Int](ncomp)

    def writeBlock(ci: Int, zz: Array[Int]): Unit = {
      val diff = zz(0) - dcPred(ci)
      dcPred(ci) = zz(0)
      val t = category(diff)
      bw.put(t, 5) // DC code = symbol value at 5 bits
      if (t > 0) {
        val v = if (diff < 0) diff + (1 << t) - 1 else diff
        bw.put(v, t)
      }
      var run = 0
      var k = 1
      while (k < 64) {
        if (zz(k) == 0) run += 1
        else {
          while (run > 15) { bw.put(acCode(0xF0), 8); run -= 16 }
          val s = category(zz(k))
          bw.put(acCode((run << 4) | s), 8)
          val v = if (zz(k) < 0) zz(k) + (1 << s) - 1 else zz(k)
          bw.put(v, s)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(acCode(0x00), 8) // EOB
    }

    /** Level-shifted spatial block from the gray plane with edge
      * replication for overhanging (padded) blocks. */
    def grayBlock(px0: Int, py0: Int): Array[Double] = {
      val f = new Array[Double](64)
      var y = 0
      while (y < 8) {
        val gy = math.min(py0 + y, h - 1)
        var x = 0
        while (x < 8) {
          val gx = math.min(px0 + x, w - 1)
          f(y * 8 + x) = gray(gy * w + gx) - 128.0
          x += 1
        }
        y += 1
      }
      f
    }

    val zeroBlock: Array[Int] = new Array[Int](64) // constant-128 chroma

    var mcuIdx = 0
    var rstIdx = 0
    def mcuBoundary(): Unit = {
      if (restartInterval > 0 && mcuIdx > 0 &&
        mcuIdx % restartInterval == 0) {
        bw.flush()
        out.write(0xFF); out.write(0xD0 | rstIdx)
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
      }
      mcuIdx += 1
    }

    if (layout == Gray) {
      val bX = (w + 7) / 8
      val bY = (h + 7) / 8
      var by = 0
      while (by < bY) {
        var bx = 0
        while (bx < bX) {
          mcuBoundary()
          writeBlock(0, fdctQuant(grayBlock(bx * 8, by * 8), quant))
          bx += 1
        }
        by += 1
      }
    } else {
      val mcusX = (w + 8 * yh - 1) / (8 * yh)
      val mcusY = (h + 8 * yv - 1) / (8 * yv)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          mcuBoundary()
          var bv = 0
          while (bv < yv) {
            var bh = 0
            while (bh < yh) {
              writeBlock(0,
                fdctQuant(grayBlock((mx * yh + bh) * 8, (my * yv + bv) * 8),
                  quant))
              bh += 1
            }
            bv += 1
          }
          writeBlock(1, zeroBlock)
          writeBlock(2, zeroBlock)
          mx += 1
        }
        my += 1
      }
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** The all-ones zigzag quant table — the exact-round-trip fixture
    * shape (constant 8×8 blocks decode to their exact gray value). */
  def unitQuant: Array[Int] = Array.fill(64)(1)
}
