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

  test("a corrupt layout marker fails loudly, not silently-flat") {
    val p = Files.createTempDirectory("graft-ddcm").toString
    Dedup.buildDedupIndexPartitioned(docs, "doc_id", "text", p,
      setBuckets = 16)
    // drop the Hadoop checksum sidecar so the direct overwrite below is
    // read back as content (not a ChecksumException)
    new java.io.File(s"$p/._graft_dedup_layout.crc").delete()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$p/_graft_dedup_layout"),
      "banded|not-a-number".getBytes("UTF-8"))
    val e = intercept[RuntimeException] {
      Dedup.dedupAgainstIndexed(spark, p, probeBatch, "doc_id", "text", 0.8)
    }
    assert(e.getMessage.contains("corrupt"),
      s"unexpected error: ${e.getMessage}")
  }
}
