package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Multimodal, Similarity, TextFns}
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

  test("two-level IVF probe: superset knob degenerates to flat, prunes when tight") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "a", Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (1L, "a", Array(1.0f, 0.2f, 0.0f, 0.0f)),
      (2L, "a", Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, "b", Array(0.8f, 0.4f, 0.0f, 0.0f)),
      (4L, "b", Array(0.7f, 0.5f, 0.0f, 0.0f)),
      (5L, "c", Array(0.0f, 0.0f, 1.0f, 0.1f)),
      (6L, "c", Array(0.0f, 0.0f, 0.9f, 0.1f))
    ).toDF("vec_id", "label", "embedding")
    val probes = Seq(
      (100L, Array(1.0f, 0.15f, 0.0f, 0.0f)),
      (200L, Array(0.0f, 0.0f, 1.0f, 0.05f))
    ).toDF("probe_id", "__pv")
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivf-2l").toString
    Similarity.buildIvfIndex(corpus, "vec_id", "embedding", "label", path,
      dims = 4)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    // 4-dim vectors: bucket on (v1>v3, v2>v4) via bits=2, offset=2.
    // superProbe >= 2^bits covers every supercell → flat ranking exactly
    val flat = rows(Similarity.ivfKnnJoinIndexed(spark, path, probes,
      "vec_id", "embedding", "label", k = 3, nProbe = 2))
    val full = rows(Similarity.ivfKnnJoinIndexed(spark, path, probes,
      "vec_id", "embedding", "label", k = 3, nProbe = 2,
      superProbe = 4, superBits = 2, superOffset = 2))
    assert(flat.nonEmpty && full == flat)
    // superProbe = 1: each probe keeps only its own supercell — cells a/b
    // (x-heavy, bucket 3) and cell c (z-heavy, bucket 0) separate, so the
    // x-probe still ranks cells a+b (its flat top-2) and gets identical
    // results, while the z-probe probes only cell c's list
    val tight = Similarity.ivfKnnJoinIndexed(spark, path, probes,
      "vec_id", "embedding", "label", k = 3, nProbe = 2,
      superProbe = 1, superBits = 2, superOffset = 2)
    val xSide = rows(tight.filter(col("probe_id") === 100L))
    assert(xSide == flat.filter(_._1 == 100L))
    val zNeighbors = tight.filter(col("probe_id") === 200L)
      .collect().map(_.getLong(2)).toSet
    assert(zNeighbors == Set(5L, 6L), "z-probe scans only cell c's list")
  }

  test("dedupAgainstIndexed over the persisted index equals the inline form") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "completely different text about spark query planning rules"),
      (3L, "another unrelated document mentioning parquet column pruning"))
      .toDF("doc_id", "text")
    val batch = Seq(
      // near-dup of 1 (one word changed late in the shingle stream)
      (10L, "the quick brown fox jumps over the lazy dog again tonight"),
      (11L, "entirely fresh content that matches nothing in the corpus"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-dedup-idx").toString
    graft.functions.Dedup.buildDedupIndex(corpus, "doc_id", "text", path)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getBoolean(3))).toSet
    val inline = rows(graft.functions.Dedup.dedupAgainst(
      batch, corpus, "doc_id", "text", 0.5))
    val indexed = rows(graft.functions.Dedup.dedupAgainstIndexed(
      spark, path, batch, "doc_id", "text", 0.5))
    assert(inline == indexed)
    assert(indexed.exists { case (id, dup, adm) =>
      id == 10L && dup.contains(1L) && !adm }, "near-dup must match doc 1")
    assert(indexed.contains((11L, None, true)), "fresh doc admitted")
  }

  test("lshBitsFor: occupancy-sized bits, contract SFs resolve to the min") {
    // ≤ 2048 vectors stay at the 8-bit minimum → contract results and the
    // DuckDB oracle (bandPairs(8, 8, 64)) are untouched by auto-sizing
    assert(Similarity.lshBitsFor(500) == 8)
    assert(Similarity.lshBitsFor(2000) == 8)
    assert(Similarity.lshBitsFor(2048) == 8)
    assert(Similarity.lshBitsFor(20000) == 12)
    assert(Similarity.lshBitsFor(200000) == 15)
    assert(Similarity.lshBitsFor(Long.MaxValue) == 20, "maxBits clamp")
    assert(Similarity.lshBitsFor(0) == 8, "empty corpus clamps to min")
  }

  test("bandPairs: no duplicate comparisons when bits*bands wraps dims") {
    // the no-wrap contract shape is byte-stable: p = j*8+i, gap by band
    val gaps = Seq(3, 5, 7, 11, 13, 19, 23, 29, 31, 37, 41, 43)
    Similarity.bandPairs(8, 8, 64).foreach { case (band, pairs) =>
      assert(pairs == (0 until 8).map { j =>
        val p = j * 8 + band
        (p + 1, (p + gaps(band)) % 64 + 1)
      })
    }
    // wrapped bits must be NEW comparisons — with a fixed gap, bit j and
    // bit j+8 were identical and the extra bits added no buckets
    Similarity.bandPairs(8, 15, 64).foreach { case (_, pairs) =>
      assert(pairs.distinct.size == pairs.size,
        "wrapped bits must not repeat a comparison within the band")
    }
  }

  test("cosineNearDupPairs: auto-sized bits ≡ explicit 8 on a small corpus") {
    import spark.implicits._
    val vecs = (0L until 60L).map(i => (i,
      Array.tabulate(8)(d => ((i * 7 + d * 3) % 11).toFloat - 5.0f)))
      .toDF("vec_id", "embedding")
    def pairs(bits: Int) = Similarity.cosineNearDupPairs(
      vecs, "vec_id", "embedding", 0.3, bands = 8, bits = bits, dims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
    val (auto, explicit) = (pairs(0), pairs(8))
    assert(auto.nonEmpty && auto == explicit)
  }

  test("semDedupIndexed over the persisted lists equals the inline form") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "a", Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, "a", Array(1.0f, 0.05f, 0.0f, 0.0f)),
      (12L, "a", Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (20L, "b", Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (21L, "b", Array(0.98f, 0.01f, 0.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivf-sem").toString
    Similarity.buildIvfIndex(corpus, "vec_id", "embedding", "label", path,
      dims = 4)
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val inline = m(Similarity.semDedupByCell(corpus, "vec_id", "embedding",
      "label", tau = 0.95))
    val indexed = m(Similarity.semDedupIndexed(spark, path, "vec_id",
      "embedding", tau = 0.95))
    assert(inline == indexed)
    assert(inline(11L) == (10L, false) && inline(21L) == (20L, false))
    assert(inline(12L) == (12L, true))
  }

  test("semDedupByCell: within-cell components keep min id; cells bound pairs") {
    import spark.implicits._
    val corpus = Seq(
      // cell "a": 10 ~ 11 ~ 12 form one chain (10-11 and 11-12 close,
      // 10-12 only via the component), 13 orthogonal singleton
      (10L, "a", Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, "a", Array(1.0f, 0.15f, 0.0f, 0.0f)),
      (12L, "a", Array(1.0f, 0.3f, 0.0f, 0.0f)),
      (13L, "a", Array(0.0f, 0.0f, 1.0f, 0.0f)),
      // cell "b": 20 is IDENTICAL to 10 but in another cell — must NOT
      // dedup against it (cell-bounded recall, the SemDeDup trade-off)
      (20L, "b", Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (21L, "b", Array(0.0f, 1.0f, 0.0f, 0.0f)),
      // zero vector: NaN cosine must NOT glue cell "b" together
      (22L, "b", Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.semDedupByCell(corpus, "vec_id", "embedding",
      "label", tau = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got(10L) == (10L, true))
    assert(got(11L) == (10L, false))
    assert(got(12L) == (10L, false), "chain closes transitively")
    assert(got(13L) == (13L, true), "orthogonal vector is a singleton")
    assert(got(20L) == (20L, true), "identical vector in another cell survives")
    assert(got(21L) == (21L, true))
    assert(got(22L) == (22L, true), "zero vector is a NaN-safe singleton")
  }

  test("unigramLmScore: harmonic-mean token probability, rare tokens score low") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "c"), (3L, "a a a a"))
      .toDF("doc_id", "text")
    val got = TextFns.unigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // corpus: N=8, cf(a)=6, cf(b)=1, cf(c)=1
    // doc1: inv = 2·(8/6) + 1·(8/1) = 32/3; hm = 3/(32/3) = 9/32
    assert(got(1L) == ((3L, 2L, 3.0 / (2.0 * (8.0 / 6.0) + 1.0 * (8.0 / 1.0)))))
    // doc2: one rare token → hm = 1/8
    assert(got(2L) == ((1L, 1L, 0.125)))
    // doc3: all frequent tokens → hm = p(a) = 6/8, the corpus-fluent doc
    assert(got(3L) == ((4L, 1L, 0.75)))
    // ordering: corpus-fluent > mixed > rare-only
    assert(got(3L)._3 > got(1L)._3 && got(1L)._3 > got(2L)._3)
  }

  test("unigramLmScoreAgainst: train-once model, Laplace OOV mass") {
    import spark.implicits._
    val modelDocs = Seq((0L, "a a b")).toDF("doc_id", "text")
    val scored = Seq((1L, "a c"), (2L, "a a"), (3L, "z"))
      .toDF("doc_id", "text")
    val model = TextFns.unigramModel(modelDocs, "text")
    val got = TextFns.unigramLmScoreAgainst(model, scored, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // model: N=3 (a:2, b:1), V=2 → smoothed 1/p = (N+V+1)/(cf+1) = 6/(cf+1)
    // doc1 "a c": inv = 1·(6/3) + 1·(6/1) = 8 → hm = 2/8
    assert(got(1L) == ((2L, 1L, 0.25)))
    // doc2 "a a": all in-vocab → hm = 2/(2·(6/3)) = 0.5
    assert(got(2L) == ((2L, 0L, 0.5)))
    // doc3 "z": all OOV → hm = 1/6, the floor for a 1-token doc
    assert(got(3L) == ((1L, 1L, 1.0 / 6.0)))
    assert(got(2L)._3 > got(1L)._3 && got(1L)._3 > got(3L)._3)
  }

  test("lmScoreTo: streaming LM quality gate against a pre-built model") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-lmstream").toString
    val modelCorpus = Seq((0L, "a a b")).toDF("doc_id", "text")
    Seq((1L, "a c"), (2L, "a a"), (3L, "z"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(s"$tmp/in")
    val q = graft.streaming.StreamOps.lmScoreTo(
      stream, modelCorpus, s"$tmp/out", s"$tmp/ckpt", "doc_id", "text",
      minHmProb = 0.2)
    q.awaitTermination()
    val admitted = spark.read.parquet(s"$tmp/out")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("hm_prob"))).toMap
    // model N=3 V=2: "a c" hm=0.25 (1 OOV), "a a" hm=0.5, "z" hm=1/6 < 0.2
    assert(admitted.keySet == Set(1L, 2L))
    assert(admitted(1L) == (("a c", 1L, 0.25)))
    assert(admitted(2L) == (("a a", 0L, 0.5)))
  }
}
