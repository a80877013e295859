package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, TextFns}
import graft.sources.Tables

/** Round-10: the partition-prunable persisted text-dedup index —
  * bit-identity with the flat layout, the FS-bytes pruning proof,
  * append/compact parity, and loud failure on layout drift. */
class Round10OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"), col("text")).localCheckpoint()

  /** Same shape as the dedup_against contract rows: near-dups of every
    * 13th doc plus fresh rewrites of every 17th. */
  private def probeBatch: DataFrame = {
    val w = TextFns.words(col("text"))
    docs.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 300000L).as("doc_id"),
        concat(lit("zzz "),
          array_join(slice(w, lit(2), size(w) - 1), " ")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 400000L).as("doc_id"),
          array_join(transform(w, x => concat(lit("n"), x)), " ")
            .as("text")))
  }

  private def verdictRows(df: DataFrame) =
    df.select("doc_id", "dup_of", "jac", "admitted").collect()
      .map(r => (r.getLong(0), Option(r.get(1)),
        Option(r.get(2)), r.getBoolean(3))).toSet

  private def fileBytesRead(): Long =
    Option(org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics
      .get("file"))
      .flatMap(s => Option(s.getLong("bytesRead")).map(_.longValue()))
      .getOrElse(0L)

  private def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(path))
  }

  private def partDirs(path: String, prefix: String): Seq[java.io.File] =
    new java.io.File(path).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))

  test("partitioned layout probe ≡ flat probe ≡ direct dedupAgainst") {
    val flat = Files.createTempDirectory("graft-ddp-flat").toString
    val banded = Files.createTempDirectory("graft-ddp-band").toString
    val corpus = docs
    Dedup.buildDedupIndex(corpus, "doc_id", "text", flat)
    Dedup.buildDedupIndexPartitioned(corpus, "doc_id", "text", banded,
      setBuckets = 16)
    val batch = probeBatch.localCheckpoint()
    val direct = verdictRows(
      Dedup.dedupAgainst(batch, corpus, "doc_id", "text", 0.8))
    val viaFlat = verdictRows(
      Dedup.dedupAgainstIndexed(spark, flat, batch, "doc_id", "text", 0.8))
    val viaBanded = verdictRows(
      Dedup.dedupAgainstIndexed(spark, banded, batch, "doc_id", "text", 0.8))
    assert(viaBanded == viaFlat, "partitioned probe must be bit-identical")
    assert(viaBanded == direct, "indexed probes must match dedupAgainst")
    assert(viaBanded.exists(!_._4) && viaBanded.exists(_._4),
      "fixture must exercise both dup and admitted verdicts")
    // and the layout is what the builder promises: value-partition dirs
    assert(partDirs(s"$banded/keys", "bp=x").nonEmpty)
    assert(partDirs(s"$banded/sets", "ib=").nonEmpty)
  }

  test("partitioned probe reads only the batch's partitions (FS bytes)") {
    val flat = Files.createTempDirectory("graft-ddb-flat").toString
    val banded = Files.createTempDirectory("graft-ddb-band").toString
    Dedup.buildDedupIndex(docs, "doc_id", "text", flat)
    Dedup.buildDedupIndexPartitioned(docs, "doc_id", "text", banded,
      setBuckets = 64)
    // a SMALL batch (3 docs): its band keys cover few of the 256 prefix
    // dirs and its candidates few of the 64 id buckets. Checkpointed so
    // neither arm pays parquet reads for the batch itself.
    val small = probeBatch.limit(3).localCheckpoint()
    // Measurement trap: parquet's vectored IO reads data pages outside
    // Hadoop's FS statistics (only footers and listings count — a full
    // scan of this index registers ~5% of its bytes), so it is turned
    // off for the measured block. The probes are driven through a full
    // collect so every verdict column — and with it every index scan —
    // is evaluated regardless of what an optimizer might prune under a
    // bare count().
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("parquet.hadoop.vectored.io.enabled", "false")
    val (flatBytes, bandedBytes) = try {
      val b0 = fileBytesRead()
      verdictRows(
        Dedup.dedupAgainstIndexed(spark, flat, small, "doc_id", "text", 0.8))
      val fb = fileBytesRead() - b0
      val b1 = fileBytesRead()
      verdictRows(
        Dedup.dedupAgainstIndexed(spark, banded, small, "doc_id", "text", 0.8))
      (fb, fileBytesRead() - b1)
    } finally hc.unset("parquet.hadoop.vectored.io.enabled")
    val idxBytes = dirBytes(flat)
    // the flat probe scans the whole index; the pruned probe must skip
    // most of it — the margin is a meaningful fraction of the index's
    // on-disk size, not a rounding error
    assert(flatBytes - bandedBytes > (0.3 * idxBytes).toLong,
      s"pruning saved too little: flat=$flatBytes banded=$bandedBytes " +
        s"index=$idxBytes")
    assert(bandedBytes < flatBytes / 2,
      s"pruned probe read too much: banded=$bandedBytes flat=$flatBytes")
  }

  test("banded probe's sets read is rooted at candidate ib DIRS only") {
    val p = Files.createTempDirectory("graft-ddpf").toString
    Dedup.buildDedupIndexPartitioned(docs, "doc_id", "text", p,
      setBuckets = 16)
    val out = Dedup.dedupAgainstIndexed(spark, p, probeBatch.limit(5),
      "doc_id", "text", 0.8)
    out.collect() // resolve the adaptive plan before inspecting it
    // round 11 moved the pruning EARLIER than a PartitionFilters clause:
    // the probe selects the candidate ib dirs driver-side and hands the
    // scan explicit subdir roots, so non-candidate dirs are never even
    // LISTED. The plan proof is therefore in the scan's input files —
    // every sets file read must live under a candidate ib= dir, and the
    // candidate set must be a strict subset of the 16 buckets.
    val setsFiles = out.inputFiles.filter(_.contains("/sets/")).toSeq
    assert(setsFiles.nonEmpty &&
      setsFiles.forall(_.matches(""".*/sets/ib=\d+/[^/]+""")),
      s"sets scan not rooted at explicit ib dirs: $setsFiles")
    val buckets = setsFiles.map(_.replaceAll(""".*/ib=(\d+)/.*""", "$1"))
      .distinct
    assert(buckets.size < 16,
      s"a 5-doc probe should select a strict subset of buckets: $buckets")
  }

  test("append to the partitioned layout ≡ partitioned rebuild") {
    val grown = Files.createTempDirectory("graft-ddap-g").toString
    val rebuilt = Files.createTempDirectory("graft-ddap-r").toString
    Dedup.buildDedupIndexPartitioned(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", grown, setBuckets = 16)
    Dedup.appendToDedupIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", grown)
    Dedup.buildDedupIndexPartitioned(docs, "doc_id", "text", rebuilt,
      setBuckets = 16)
    val batch = probeBatch.localCheckpoint()
    val g = verdictRows(
      Dedup.dedupAgainstIndexed(spark, grown, batch, "doc_id", "text", 0.8))
    val r = verdictRows(
      Dedup.dedupAgainstIndexed(spark, rebuilt, batch, "doc_id", "text", 0.8))
    assert(g == r && g.nonEmpty,
      "append-then-probe must equal rebuild-then-probe")
    // appended rows landed IN partition dirs (no flat files beside them)
    val stray = new java.io.File(s"$grown/sets").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(stray.isEmpty, s"append wrote flat files: ${stray.mkString(",")}")
  }

  test("compact preserves the partitioned layout and the probe verdicts") {
    val p = Files.createTempDirectory("graft-ddcp").toString
    Dedup.buildDedupIndexPartitioned(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", p, setBuckets = 8)
    Dedup.appendToDedupIndex(docs.filter(col("doc_id") % 4 === 1),
      "doc_id", "text", p)
    Dedup.appendToDedupIndex(docs.filter(col("doc_id") % 4 === 3),
      "doc_id", "text", p)
    val batch = probeBatch.localCheckpoint()
    val before = verdictRows(
      Dedup.dedupAgainstIndexed(spark, p, batch, "doc_id", "text", 0.8))
    val counts = Dedup.compactDedupIndex(spark, p)
    assert(counts("sets") == docs.count(),
      "compact must keep every corpus row")
    val after = verdictRows(
      Dedup.dedupAgainstIndexed(spark, p, batch, "doc_id", "text", 0.8))
    assert(after == before, "compaction changed the verdicts")
    // one file per partition dir, layout intact
    for (d <- partDirs(s"$p/sets", "ib=") ++ partDirs(s"$p/keys", "bp="))
      assert(d.listFiles().count(f =>
        f.isFile && f.getName.endsWith(".parquet")) == 1,
        s"${d.getName} not compacted to one file")
  }

  test("migrateToPartitionedIndex: in-place flat→banded, no re-shingle") {
    val p = Files.createTempDirectory("graft-ddmig").toString
    Dedup.buildDedupIndex(docs, "doc_id", "text", p)
    val batch = probeBatch.localCheckpoint()
    val before = verdictRows(
      Dedup.dedupAgainstIndexed(spark, p, batch, "doc_id", "text", 0.8))
    val counts = Dedup.migrateToPartitionedIndex(spark, p, setBuckets = 16)
    assert(counts("sets") == docs.count())
    // layout flipped: marker + partition dirs present
    assert(new java.io.File(s"$p/_graft_dedup_layout").exists())
    assert(partDirs(s"$p/sets", "ib=").nonEmpty &&
      partDirs(s"$p/keys", "bp=x").nonEmpty)
    // probes are bit-identical through the migration, and appends land
    // in the banded layout
    val after = verdictRows(
      Dedup.dedupAgainstIndexed(spark, p, batch, "doc_id", "text", 0.8))
    assert(after == before && after.nonEmpty)
    assert(intercept[IllegalArgumentException] {
      Dedup.migrateToPartitionedIndex(spark, p)
    }.getMessage.contains("already partitioned"))
    // an epoch-partitioned ingest tree is refused (its sets carry the
    // __batch partition column)
    val ingest = Files.createTempDirectory("graft-ddmig-i").toString + "/idx"
    graft.streaming.StreamOps.dedupIngestBootstrap(
      docs.limit(5), ingest, "doc_id", "text")
    assert(intercept[IllegalArgumentException] {
      Dedup.migrateToPartitionedIndex(spark, ingest)
    }.getMessage.contains("not a flat dedup index"))
  }

  test("a batch with no shingles probes cleanly (empty partition filters)") {
    import spark.implicits._
    val p = Files.createTempDirectory("graft-ddsh").toString
    Dedup.buildDedupIndexPartitioned(docs, "doc_id", "text", p,
      setBuckets = 16)
    // two words → zero 3-shingles → no band keys → empty prefix list
    val tiny = Seq((999999L, "hello world")).toDF("doc_id", "text")
    val out = verdictRows(
      Dedup.dedupAgainstIndexed(spark, p, tiny, "doc_id", "text", 0.8))
    assert(out == Set((999999L, None, None, true)))
  }

  // ---- frozen-keys line strip (the streaming line stage's core) ----

  test("stripLinesByKeys vs its own corpus ≡ dedupLinesByHash, columns intact") {
    val lined = docs.select(col("doc_id"),
      regexp_replace(col("text"), "((?:[^ ]+ ){7}[^ ]+) ", "$1\n").as("text"),
      (col("doc_id") % 5).as("extra")) // a passenger column
    val keys = Dedup.repeatedLineKeys(lined, "doc_id", "text")
    val stripped = Dedup.stripLinesByKeys(lined, keys, "doc_id", "text")
    assert(stripped.columns.toSeq ==
      Seq("doc_id", "text", "extra", "n_lines_removed"),
      s"columns: ${stripped.columns.toSeq}")
    val got = stripped.select("doc_id", "text", "n_lines_removed").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = Dedup.dedupLinesByHash(
      lined.select("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "clean_text", "n_removed").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want, "frozen-keys strip diverged from the one-shot form")
    assert(got.exists(_._3 > 0), "fixture must actually strip something")
    // passenger columns survive untouched
    assert(stripped.filter(col("extra") =!= col("doc_id") % 5).count() == 0)
  }

  // ---- audio container headers (WAV/RIFF + MP3) ----

  test("AudioHeader round-trips its own WAV and MP3 fixtures") {
    import graft.functions.Multimodal.AudioHeader
    val payload = "some sample audio payload bytes".getBytes("UTF-8")
    val wav = AudioHeader.parse(
      AudioHeader.wavBytes(2, 16000, 16, payload))
    assert(wav.exists(i => i.format == "audio/wav" && i.channels == 2 &&
      i.sampleRate == 16000 && i.bitsPerSample == 16 &&
      i.headerLen == 64 && i.dataLen == payload.length &&
      i.bitrateKbps == 16000 * 2 * 16 / 8 * 8 / 1000), s"$wav")
    val mp3 = AudioHeader.parse(AudioHeader.mp3Bytes(payload))
    assert(mp3.exists(i => i.format == "audio/mpeg" && i.channels == 2 &&
      i.sampleRate == 44100 && i.bitsPerSample == 0 &&
      i.bitrateKbps == 128 && i.headerLen == 34 &&
      i.dataLen == payload.length), s"$mp3")
  }

  test("AudioHeader rejects malformed containers instead of misparsing") {
    import graft.functions.Multimodal.AudioHeader
    val payload = "payload".getBytes("UTF-8")
    val good = AudioHeader.wavBytes(1, 8000, 16, payload)
    def mut(src: Array[Byte])(f: Array[Byte] => Unit): Array[Byte] = {
      val c = src.clone(); f(c); c
    }
    // truncated inside the fmt chunk
    assert(AudioHeader.parse(good.take(30)).isEmpty, "truncated WAV")
    // RIFF but not WAVE
    assert(AudioHeader.parse(mut(good)(b => b(8) = 'A')).isEmpty)
    // a chunk whose declared size runs past the buffer
    assert(AudioHeader.parse(mut(good)(b => b(40) = 0x7F.toByte)).isEmpty,
      "chunk-size overrun must reject, not read out of bounds")
    // zero channels in fmt
    assert(AudioHeader.parse(mut(good)(b => { b(22) = 0; b(23) = 0 })).isEmpty)
    // data chunk with NO preceding fmt: RIFF + WAVE + bare data chunk
    val bb = java.nio.ByteBuffer.allocate(44 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + payload.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("data".getBytes("US-ASCII")).putInt(payload.length).put(payload)
    assert(AudioHeader.parse(bb.array()).isEmpty, "data before fmt")

    val goodMp3 = AudioHeader.mp3Bytes(payload)
    // broken frame sync after the ID3 tag
    assert(AudioHeader.parse(mut(goodMp3)(b => b(30) = 0x00)).isEmpty)
    // reserved bitrate index 15 (0xF0 in the third header byte)
    assert(AudioHeader.parse(mut(goodMp3)(b => b(32) = 0xF0.toByte)).isEmpty)
    // free-format bitrate index 0
    assert(AudioHeader.parse(mut(goodMp3)(b => b(32) = 0x00.toByte)).isEmpty)
    // reserved sample-rate index 3 (keep 128kbps nibble)
    assert(AudioHeader.parse(mut(goodMp3)(b => b(32) = 0x9C.toByte)).isEmpty)
    // ID3 synchsafe size running past the buffer
    assert(AudioHeader.parse(mut(goodMp3)(b => b(9) = 0x7F.toByte)).isEmpty)
    // non-synchsafe ID3 size byte (high bit set)
    assert(AudioHeader.parse(mut(goodMp3)(b => b(9) = 0x80.toByte)).isEmpty)
    // MPEG2 version bits (the tables here are MPEG1-only)
    assert(AudioHeader.parse(mut(goodMp3)(b => b(31) = 0xF3.toByte)).isEmpty)
  }

  test("a corrupt layout marker fails loudly, not silently-flat") {
    val p = Files.createTempDirectory("graft-ddcm").toString
    Dedup.buildDedupIndexPartitioned(docs, "doc_id", "text", p,
      setBuckets = 16)
    // drop the Hadoop checksum sidecar so the direct overwrite below is
    // read back as content (not a ChecksumException)
    def poison(content: String): Unit = {
      new java.io.File(s"$p/._graft_dedup_layout.crc").delete()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$p/_graft_dedup_layout"),
        content.getBytes("UTF-8"))
    }
    poison("banded|not-a-number")
    val e = intercept[RuntimeException] {
      Dedup.dedupAgainstIndexed(spark, p, probeBatch, "doc_id", "text", 0.8)
    }
    assert(e.getMessage.contains("corrupt"),
      s"unexpected error: ${e.getMessage}")
    // a bare number (truncated/foreign write) is NOT a valid marker: it
    // must not pass as a bucket count that mis-buckets later appends
    poison("16")
    val e2 = intercept[RuntimeException] {
      Dedup.dedupAgainstIndexed(spark, p, probeBatch, "doc_id", "text", 0.8)
    }
    assert(e2.getMessage.contains("corrupt"),
      s"unexpected error: ${e2.getMessage}")
  }

  test("flat rebuild over a formerly-partitioned path retires the marker") {
    val p = Files.createTempDirectory("graft-ddfr").toString
    Dedup.buildDedupIndexPartitioned(docs, "doc_id", "text", p,
      setBuckets = 16)
    // rebuild FLAT at the same path: the marker must go with the old
    // layout, or every later probe filters on a bp column that no
    // longer exists
    Dedup.buildDedupIndex(docs, "doc_id", "text", p)
    val batch = probeBatch.localCheckpoint()
    val viaRebuilt = verdictRows(
      Dedup.dedupAgainstIndexed(spark, p, batch, "doc_id", "text", 0.8))
    val direct = verdictRows(
      Dedup.dedupAgainst(batch, docs, "doc_id", "text", 0.8))
    assert(viaRebuilt == direct && viaRebuilt.nonEmpty,
      "flat rebuild over a partitioned path must probe flat and match")
  }

  test("WAV fingerprint ignores trailing chunks and the pad byte") {
    import spark.implicits._
    import graft.functions.Multimodal
    import graft.functions.Multimodal.AudioHeader
    // ODD payload length: a spec-conforming writer pads the data chunk
    // to even before any trailing chunk
    val payload = "seven bytes and then some more audio data x".getBytes("UTF-8")
    assert(payload.length % 2 == 1, "fixture wants an odd data length")
    val bare = AudioHeader.wavBytes(1, 8000, 16, payload)
    val trailing = {
      val extra = java.nio.ByteBuffer.allocate(13)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      extra.put(0.toByte) // the data chunk's odd-size pad byte
      extra.put("LIST".getBytes("US-ASCII")).putInt(4)
        .put("INFO".getBytes("US-ASCII"))
      bare ++ extra.array()
    }
    // both parse as the SAME audio (the parser stops at data)
    assert(AudioHeader.parse(trailing).map(i => (i.channels, i.dataLen)) ==
      AudioHeader.parse(bare).map(i => (i.channels, i.dataLen)))
    val media = Seq(
      (1L, "audio/wav", bare, bare.length.toLong),
      (2L, "audio/wav", trailing, trailing.length.toLong))
      .toDF("doc_id", "kind", "content", "byte_len")
    val fps = Multimodal.decodeAudioFeatures(spark, media)
      .collect().map(f => f.docId -> f.fingerprint).toMap
    assert(fps(1L) == fps(2L),
      "byte-identical audio must fingerprint identically across containers")
  }
}
