package graft

import java.io.ByteArrayInputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{JpegCodec, Multimodal, PngCodec}

/** The pure-JVM baseline JPEG codec, pinned the way the PNG codec was:
  * against the JDK's OWN ImageIO JPEG implementation in both
  * directions, exact round-trips on the constant-block fixture shape,
  * the cross-CODEC re-encode property (same pixels as PNG and as JPEG
  * hash identically), scope-guard rejections, and a mutation fuzz
  * pass. */
class JpegPhashSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  /** 72×64 gray plane whose 8×8 blocks are the fixture grid constants —
    * the exact-round-trip shape (DC-only blocks under a unit quant). */
  private def cellPixels(g: Long, v: Long): Array[Int] = {
    val px = new Array[Int](72 * 64)
    for (y <- 0 until 64; x <- 0 until 72)
      px(y * 72 + x) = Multimodal.phashFixtureGray(g, v, y / 8, x / 8)
    px
  }

  test("constant-block images round-trip EXACTLY through every layout") {
    for (layout <- Seq(JpegCodec.Gray, JpegCodec.Color444,
      JpegCodec.Color420); g <- Seq(0L, 7L, 24L)) {
      val px = cellPixels(g, 0L)
      val bytes = JpegCodec.encode(px, 72, 64, layout, JpegCodec.unitQuant)
      val dec = JpegCodec.decode(bytes)
      assert(dec.isDefined, s"layout=$layout g=$g")
      assert(dec.get.width == 72 && dec.get.height == 64)
      assert(dec.get.gray.sameElements(px), s"layout=$layout g=$g")
    }
  }

  test("restart markers: DRI-encoded stream decodes identically") {
    val px = cellPixels(11L, 0L)
    val plain = JpegCodec.decode(
      JpegCodec.encode(px, 72, 64, JpegCodec.Color420, JpegCodec.unitQuant))
    for (dri <- Seq(1, 3, 7)) {
      val withRst = JpegCodec.encode(px, 72, 64, JpegCodec.Color420,
        JpegCodec.unitQuant, restartInterval = dri)
      val dec = JpegCodec.decode(withRst)
      assert(dec.isDefined, s"dri=$dri")
      assert(dec.get.gray.sameElements(plain.get.gray), s"dri=$dri")
    }
  }

  test("arbitrary pixels round-trip within DCT rounding (unit quant)") {
    val r = rng(7)
    // not multiples of 8/16 on purpose: edge blocks + padded MCUs
    val (w, h) = (43, 29)
    val px = Array.fill(w * h)(r.nextInt(256))
    for (layout <- Seq(JpegCodec.Gray, JpegCodec.Color444,
      JpegCodec.Color420)) {
      val dec = JpegCodec.decode(
        JpegCodec.encode(px, w, h, layout, JpegCodec.unitQuant))
      assert(dec.isDefined, s"layout=$layout")
      assert(dec.get.width == w && dec.get.height == h)
      val maxDiff = dec.get.gray.zip(px).map { case (a, b) =>
        math.abs(a - b) }.max
      assert(maxDiff <= 2, s"layout=$layout maxDiff=$maxDiff")
    }
  }

  test("our encoder's output decodes under the JDK's ImageIO") {
    // ImageIO ships a fully independent baseline JPEG implementation:
    // agreement pins marker framing, DHT canonicalization, byte
    // stuffing, dequant and IDCT at once. Constant blocks are exact
    // under any conformant IDCT up to its ±1 rounding latitude.
    for (layout <- Seq(JpegCodec.Gray, JpegCodec.Color444,
      JpegCodec.Color420)) {
      val px = cellPixels(3L, 0L)
      val bytes = JpegCodec.encode(px, 72, 64, layout, JpegCodec.unitQuant)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected layout=$layout")
      assert(img.getWidth == 72 && img.getHeight == 64)
      for (y <- 0 until 64; x <- 0 until 72) {
        // gray layouts decode to a 1-band raster (Y directly); color
        // layouts come back as RGB with R=G=B=Y (zero chroma)
        val got =
          if (img.getRaster.getNumBands == 1) img.getRaster.getSample(x, y, 0)
          else img.getRGB(x, y) & 0xFF
        assert(math.abs(got - px(y * 72 + x)) <= 1,
          s"layout=$layout ($x,$y): $got vs ${px(y * 72 + x)}")
      }
    }
  }

  test("our decoder handles ImageIO-encoded bytes (foreign encoder)") {
    // grayscale content in both a gray and an RGB BufferedImage, top
    // writer quality (near-unit quant tables): our Y plane must agree
    // with ImageIO's own decode of the same bytes within IDCT latitude
    for (imgType <- Seq(java.awt.image.BufferedImage.TYPE_BYTE_GRAY,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)) {
      val (w, h) = (50, 38)
      val r = rng(imgType)
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w) {
        val g = r.nextInt(256)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(1.0f)
      writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      writer.dispose()
      val bytes = bos.toByteArray

      val ours = JpegCodec.decode(bytes)
      assert(ours.isDefined, s"our decoder rejected ImageIO type=$imgType")
      assert(ours.get.width == w && ours.get.height == h)
      val theirs = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val t =
          if (theirs.getRaster.getNumBands == 1)
            theirs.getRaster.getSample(x, y, 0)
          else theirs.getRGB(x, y) & 0xFF
        maxDiff = math.max(maxDiff, math.abs(t - ours.get.gray(y * w + x)))
      }
      assert(maxDiff <= 3, s"type=$imgType maxDiff=$maxDiff")
    }
  }

  test("cross-codec re-encode: PNG and JPEG of the same grid hash identically") {
    // THE gap this codec closes: the same picture re-encoded as JPEG
    // was invisible to the perceptual pass. Different container, very
    // different bytes, identical dHash.
    for (g <- Seq(0L, 9L, 24L)) {
      val pngPx = new Array[Byte](36 * 32)
      for (y <- 0 until 32; x <- 0 until 36)
        pngPx(y * 36 + x) = Multimodal.phashFixtureGray(g, 0L, y / 4, x / 4).toByte
      val png = PngCodec.encode(pngPx, 36, 32, 0, _ % 5, 6)
      val jpeg = JpegCodec.encode(cellPixels(g, 0L), 72, 64,
        JpegCodec.Color420, JpegCodec.unitQuant)
      // exact-bytes dedup can never pair these…
      assert(!java.util.Arrays.equals(png, jpeg))
      // …the perceptual hash must
      assert(PngCodec.dHashOf(png).get == JpegCodec.dHashOf(jpeg).get, s"g=$g")
      assert(PngCodec.dHashOf(jpeg).isEmpty, "PNG decoder must reject JPEG")
      assert(JpegCodec.dHashOf(png).isEmpty, "JPEG decoder must reject PNG")
    }
  }

  test("scope guard: out-of-scope and damaged streams decode to None") {
    val good = JpegCodec.encode(cellPixels(5L, 0L), 72, 64,
      JpegCodec.Gray, JpegCodec.unitQuant)
    assert(JpegCodec.decode(good).isDefined)
    // truncation anywhere
    assert(JpegCodec.decode(good.take(good.length - 3)).isEmpty)
    assert(JpegCodec.decode(good.take(20)).isEmpty)
    assert(JpegCodec.decode(good.take(2)).isEmpty)
    // progressive flag: rewrite the SOF0 marker byte to SOF2
    val sofAt = {
      var i = 2
      while (!((good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xC0)) i += 1
      i + 1
    }
    val prog = good.clone(); prog(sofAt) = 0xC2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
    // extended sequential + arithmetic also out of scope
    val ext = good.clone(); ext(sofAt) = 0xC1.toByte
    assert(JpegCodec.decode(ext).isEmpty)
    val arith = good.clone(); arith(sofAt) = 0xC9.toByte
    assert(JpegCodec.decode(arith).isEmpty)
    // 12-bit precision byte inside SOF
    val deep = good.clone(); deep(sofAt + 3) = 12.toByte
    assert(JpegCodec.decode(deep).isEmpty)
    // header allocation bomb: dims claiming > 16M pixels
    val bomb = good.clone()
    bomb(sofAt + 4) = 0x7F.toByte; bomb(sofAt + 5) = 0xFF.toByte // h
    bomb(sofAt + 6) = 0x7F.toByte; bomb(sofAt + 7) = 0xFF.toByte // w
    assert(JpegCodec.decode(bomb).isEmpty)
    // garbage entropy data: valid headers, then FF-stuffed all-ones bits
    // (no 8-bit code 255 exists in the encoder tables → Huffman dead end)
    val sosEnd = {
      var i = 2
      while (!((good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xDA)) i += 1
      i + 2 + (((good(i + 2) & 0xFF) << 8) | (good(i + 3) & 0xFF))
    }
    val junk = good.take(sosEnd) ++
      Array.fill(32)(Array(0xFF.toByte, 0x00.toByte)).flatten ++
      Array(0xFF.toByte, 0xD9.toByte)
    assert(JpegCodec.decode(junk).isEmpty)
    // not a JPEG at all
    assert(JpegCodec.decode("plain text".getBytes).isEmpty)
    assert(JpegCodec.decode(null).isEmpty)
    assert(JpegCodec.decode(Array.emptyByteArray).isEmpty)
    // missing EOI (entropy data runs off the end)
    assert(JpegCodec.decode(good.take(good.length - 2)).isEmpty)
  }

  test("end-to-end mixed-codec fixture pairs match the plain-Scala model") {
    import SparkTestSession._
    import spark.implicits._
    val ids = (0L until 120L).toDF("doc_id")
    val media = Multimodal.phashFixtureMediaJpeg(spark, ids, groups = 25)
    val got = Multimodal.phashNearDup(spark, media, maxHamming = 3)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getInt(2)))
      .toSet
    def modelHash(id: Long): Option[Long] = {
      if (id % 11 == 0) return None
      val v = id % 3; val g = (id / 3) % 25
      var h = 0L
      for (cy <- 0 until 8; cx <- 0 until 8)
        if (Multimodal.phashFixtureGray(g, v, cy, cx) >
          Multimodal.phashFixtureGray(g, v, cy, cx + 1))
          h |= 1L << (cy * 8 + cx)
      Some(h)
    }
    val hashes = (0L until 120L).flatMap(i => modelHash(i).map(i -> _))
    val want = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == want && want.nonEmpty)
    // the cross-CODEC pair shape is present: a PNG (v=0) and a JPEG
    // (v=1) of the same group at hamming 0, with different bytes
    val contents = media.select("doc_id", "content")
      .as[(Long, Array[Byte])].collect().toMap
    val cross = want.find { case (a, b, d) =>
      d == 0 && a % 3 == 0 && b % 3 == 1 && a / 3 % 25 == b / 3 % 25 }
    assert(cross.isDefined, "no PNG↔JPEG hamming-0 pair in the fixture")
    val (pa, pb, _) = cross.get
    assert((contents(pa)(0) & 0xFF) == 0x89, "v=0 must be PNG")
    assert((contents(pb)(0) & 0xFF) == 0xFF, "v=1 must be JPEG")
  }

  test("mutation fuzz: decode never throws or hangs (600 cases)") {
    val seeds = Seq(
      JpegCodec.encode(cellPixels(1L, 0L), 72, 64, JpegCodec.Gray,
        JpegCodec.unitQuant),
      JpegCodec.encode(cellPixels(2L, 2L), 72, 64, JpegCodec.Color420,
        JpegCodec.unitQuant, restartInterval = 3),
      JpegCodec.encode(Array.fill(43 * 29)(rng(3).nextInt(256)), 43, 29,
        JpegCodec.Color444, JpegCodec.unitQuant))
    val r = rng(1400L)
    var decoded = 0
    for (i <- 0 until 600) {
      val base = seeds(i % seeds.length)
      val b = base.clone()
      r.nextInt(4) match {
        case 0 => // flip random bytes
          for (_ <- 0 to r.nextInt(8))
            b(r.nextInt(b.length)) = (b(r.nextInt(b.length)) ^ (1 << r.nextInt(8))).toByte
        case 1 => // truncate
          val cut = r.nextInt(b.length)
          val t = b.take(cut)
          if (JpegCodec.decode(t).isDefined) decoded += 1
        case 2 => // splice a random marker byte pair
          val at = r.nextInt(b.length - 2)
          b(at) = 0xFF.toByte; b(at + 1) = r.nextInt(256).toByte
        case 3 => // overwrite a random span with noise
          val at = r.nextInt(b.length - 8)
          for (j <- 0 until 8) b(at + j) = r.nextInt(256).toByte
      }
      val res = JpegCodec.decode(b) // must return, not throw/hang
      if (res.isDefined) {
        decoded += 1
        val d = res.get
        assert(d.gray.length == d.width * d.height)
        assert(d.gray.forall(g => g >= 0 && g <= 255))
      }
    }
    // some mutations should survive (mutations in padding/metadata) and
    // many must not — both extremes would mean the mutator is broken
    assert(decoded < 600)
  }
}
