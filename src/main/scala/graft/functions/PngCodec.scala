package graft.functions

import java.util.zip.{CRC32, Deflater, Inflater}

/**
 * Pure-JVM PNG pixel codec for the perceptual image near-dup pass
 * (SURVEY §2.6 extension): non-interlaced 8-bit PNGs (grayscale,
 * truecolor, truecolor+alpha) decode to grayscale pixels with nothing
 * beyond `java.util.zip.Inflater` — no AWT, no native codec — so the
 * decode runs inside executor `mapPartitions` loops with zero library
 * risk. The encoder exists for fixtures and tests: it produces real
 * spec-conformant PNGs (zlib IDAT, per-row filter bytes, chunk CRCs)
 * with a caller-chosen filter strategy and deflate level, which is
 * exactly what "the same pixels, re-encoded" needs — byte-different
 * files that any exact-bytes dedup misses and the perceptual hash
 * catches.
 *
 * Scope guard: bit depth 8, color types 0/2/6, no interlace, no
 * palette. Anything else — and any structural damage (bad signature,
 * truncated chunk, CRC mismatch, inflate failure, wrong pixel-byte
 * count, unknown filter byte) — decodes to None; the near-dup pass
 * drops such rows rather than hashing garbage.
 */
object PngCodec {

  private val Sig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def channels(colorType: Int): Int = colorType match {
    case 0 => 1
    case 2 => 3
    case 6 => 4
    case _ => -1
  }

  /** PNG Paeth predictor (spec §6.6) — ties resolve left, up, upleft. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ---------------------------------------------------------------- encode

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
                    data: Array[Byte]): Unit = {
    val bb = java.nio.ByteBuffer.allocate(4)
    bb.putInt(data.length)
    out.write(bb.array())
    val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(tb)
    out.write(data)
    val crc = new CRC32(); crc.update(tb); crc.update(data)
    val cb = java.nio.ByteBuffer.allocate(4); cb.putInt(crc.getValue.toInt)
    out.write(cb.array())
  }

  /**
   * Encode raw samples (row-major, `channels(colorType)` bytes per pixel)
   * as a valid PNG. `filterFor(row)` picks the filter type (0-4) per
   * scanline — different strategies over the same pixels yield different
   * bytes, the re-encoded-duplicate shape. IDAT splits at 8 KiB so
   * multi-IDAT concatenation is exercised by every nontrivial image.
   */
  def encode(samples: Array[Byte], w: Int, h: Int, colorType: Int,
             filterFor: Int => Int, deflateLevel: Int): Array[Byte] = {
    val ch = channels(colorType)
    require(ch > 0, s"unsupported colorType $colorType")
    require(samples.length == w * h * ch,
      s"samples ${samples.length} != $w*$h*$ch")
    val rowBytes = w * ch
    val filtered = new Array[Byte](h * (1 + rowBytes))
    var y = 0
    while (y < h) {
      val f = filterFor(y)
      require(f >= 0 && f <= 4, s"filter $f out of range")
      filtered(y * (1 + rowBytes)) = f.toByte
      var i = 0
      while (i < rowBytes) {
        val raw = samples(y * rowBytes + i) & 0xFF
        val left = if (i >= ch) samples(y * rowBytes + i - ch) & 0xFF else 0
        val up = if (y > 0) samples((y - 1) * rowBytes + i) & 0xFF else 0
        val ul = if (y > 0 && i >= ch) samples((y - 1) * rowBytes + i - ch) & 0xFF else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        filtered(y * (1 + rowBytes) + 1 + i) = ((raw - pred) & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    val defl = new Deflater(deflateLevel)
    defl.setInput(filtered); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val z = zout.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte).put(colorType.toByte)
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    chunk(out, "IHDR", ihdr.array())
    var off = 0
    while (off < z.length || off == 0) {
      val n = math.min(8192, z.length - off)
      chunk(out, "IDAT", java.util.Arrays.copyOfRange(z, off, off + n))
      off += math.max(n, 1)
    }
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** Decoded image: grayscale pixels (0-255), row-major. Truecolor maps
    * through integer luma (r*299 + g*587 + b*114) / 1000; alpha ignored. */
  final case class Decoded(width: Int, height: Int, gray: Array[Int])

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)

  /**
   * Decode a non-interlaced 8-bit PNG (color type 0/2/6) to grayscale.
   * Every structural invariant is checked — signature, chunk bounds,
   * chunk CRCs, IHDR mode bytes, zlib inflate success, exact
   * filtered-byte count, filter-byte range — and any violation returns
   * None (the caller drops the row; a corrupt crawl payload must never
   * contribute a hash).
   */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if (bytes(i) != Sig(i)) return None; i += 1 }
    var p = 8
    var w = 0; var h = 0; var colorType = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend) {
      if (p + 8 > bytes.length) return None
      val len = be32(bytes, p)
      if (len < 0 || len > Int.MaxValue - 12 || p + 12 + len > bytes.length)
        return None
      val typ = new String(bytes, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new CRC32(); crc.update(bytes, p + 4, 4 + len.toInt)
      if (crc.getValue.toInt != be32(bytes, p + 8 + len.toInt).toInt) return None
      typ match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return None
          sawIhdr = true
          val wl = be32(bytes, p + 8); val hl = be32(bytes, p + 12)
          // bounded: this decoder exists for hash inputs, and the
          // filtered-scanline buffer allocates from the HEADER's claim
          // before inflate validates anything — a crafted 64×2^20 header
          // with no data would otherwise demand ~270 MB per row across
          // every executor thread. 16M pixels (≤ ~68 MB RGBA scanlines)
          // is far beyond any perceptual-hash input; bigger claims are
          // treated as corrupt, not decoded.
          if (wl <= 0 || hl <= 0 || wl > (1 << 20) || hl > (1 << 20) ||
            wl * hl > (1L << 24)) return None
          w = wl.toInt; h = hl.toInt
          val bitDepth = bytes(p + 16) & 0xFF
          colorType = bytes(p + 17) & 0xFF
          val compression = bytes(p + 18) & 0xFF
          val filterMethod = bytes(p + 19) & 0xFF
          val interlace = bytes(p + 20) & 0xFF
          if (bitDepth != 8 || channels(colorType) < 0 || compression != 0 ||
            filterMethod != 0 || interlace != 0) return None
        case "IDAT" =>
          if (!sawIhdr) return None
          idat.write(bytes, p + 8, len.toInt)
        case "IEND" =>
          if (!sawIhdr || len != 0) return None
          sawIend = true
        case _ => if (!sawIhdr) return None // ancillary chunks skipped
      }
      p += 12 + len.toInt
    }
    val ch = channels(colorType)
    val rowBytes = w * ch
    val expect = h * (1 + rowBytes)
    val filtered = new Array[Byte](expect)
    val infl = new Inflater()
    infl.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < expect && !infl.finished()) {
        val n = infl.inflate(filtered, got, expect - got)
        // zero progress on an unfinished stream is terminal whatever the
        // reason — truncated input (needsInput) OR a preset-dictionary
        // demand (FDICT set in the zlib header: inflate returns 0 with
        // needsInput FALSE, and a needsInput-only check spins this loop
        // forever on a crafted payload)
        if (n == 0) return None
        got += n
      }
      if (got != expect) return None
      // a stream that keeps producing past the expected byte count is
      // structurally wrong (extra scanlines) — reject it too
      val probe = new Array[Byte](1)
      if (!infl.finished() && infl.inflate(probe, 0, 1) > 0) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally infl.end()

    // unfilter in place into raw samples
    val raw = new Array[Byte](h * rowBytes)
    var y = 0
    while (y < h) {
      val f = filtered(y * (1 + rowBytes)) & 0xFF
      if (f > 4) return None
      var i = 0
      while (i < rowBytes) {
        val v = filtered(y * (1 + rowBytes) + 1 + i) & 0xFF
        val left = if (i >= ch) raw(y * rowBytes + i - ch) & 0xFF else 0
        val up = if (y > 0) raw((y - 1) * rowBytes + i) & 0xFF else 0
        val ul = if (y > 0 && i >= ch) raw((y - 1) * rowBytes + i - ch) & 0xFF else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * rowBytes + i) = ((v + pred) & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    val gray = new Array[Int](w * h)
    var j = 0
    while (j < w * h) {
      gray(j) =
        if (ch == 1) raw(j) & 0xFF
        else ((raw(j * ch) & 0xFF) * 299 + (raw(j * ch + 1) & 0xFF) * 587 +
          (raw(j * ch + 2) & 0xFF) * 114) / 1000
      j += 1
    }
    Some(Decoded(w, h, gray))
  }

  // ---------------------------------------------------------------- dHash

  /**
   * 64-bit difference hash: box-average the grayscale to a 9x8 grid
   * (floor-boundary cells, integer mean), then bit cy*8+cx is set iff
   * grid(cy)(cx) > grid(cy)(cx+1). Deterministic integer arithmetic
   * end to end, so an oracle that knows the pixels can reproduce the
   * hash exactly. Images smaller than the grid don't hash (None).
   */
  def dHash64(gray: Array[Int], w: Int, h: Int): Option[Long] = {
    if (w < 9 || h < 8 || gray.length != w * h) return None
    val grid = Array.ofDim[Long](8, 9)
    var cy = 0
    while (cy < 8) {
      val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
      var cx = 0
      while (cx < 9) {
        val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
        var s = 0L; var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += gray(y * w + x); x += 1 }
          y += 1
        }
        grid(cy)(cx) = s / ((y1 - y0).toLong * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    var hash = 0L
    cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (grid(cy)(cx) > grid(cy)(cx + 1)) hash |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    Some(hash)
  }

  /** decode + dHash in one step — the per-row executor path. */
  def dHashOf(bytes: Array[Byte]): Option[Long] =
    decode(bytes).flatMap(d => dHash64(d.gray, d.width, d.height))
}
