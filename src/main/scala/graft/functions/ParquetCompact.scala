package graft.functions

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Small-file compaction for the append-maintained persisted indexes
 * ([[Dedup.appendToDedupIndex]], [[Similarity.appendToIvfIndex]]) — the
 * same problem [[graft.streaming.StreamOps.compactState]] solves for the
 * streaming state's `batch=` partitions, for flat / value-partitioned
 * tables: every appended batch adds part files, and a long-lived ingest
 * path accumulates thousands of them (each one a task + open-file cost
 * per probe).
 *
 * Crash-safe at EVERY window — the round-7 in-place `mode(overwrite)`
 * had one loss case (a JVM crash mid-overwrite killed both the on-disk
 * files and the localCheckpoint holding the only other copy). Now the
 * compacted rows are STAGED in a sibling directory and swapped in by
 * rename, so at no instant is the staged copy the only one:
 *
 *   1. write compacted rows to `<path>.__compact_tmp` (source untouched)
 *   2. rename `<path>` → `<path>.__compact_old`     (atomic on one FS)
 *   3. rename tmp → `<path>`                        (atomic)
 *   4. delete `<path>.__compact_old`
 *
 * [[recover]] runs first on every call and repairs any prior crash: an
 * orphan `__old` with no live `<path>` is renamed back (crash between 2
 * and 3); an `__old` beside a live `<path>` is a completed swap whose
 * cleanup step died (crash between 3 and 4) and is deleted; any `__tmp`
 * is always stale (incomplete or superseded) and deleted. Single-writer
 * discipline as before: no concurrent probe/append on the path.
 *
 * FILESYSTEM ASSUMPTION: the swap's crash-safety rests on directory
 * rename being ATOMIC, which holds on HDFS and local filesystems but NOT
 * on object stores (S3A "rename" is a non-atomic copy+delete; a crash
 * mid-rename leaves a partial old/live mix that [[recover]] would
 * misclassify as a completed swap). On an object store, compact into a
 * NEW path and flip a pointer (manifest) instead, or use a
 * table format with commit semantics. The FileSystem is resolved FROM
 * THE PATH (not the default-FS singleton), so an `s3a://`/`hdfs://` path
 * at least talks to the right store rather than silently probing the
 * default filesystem for its marker directories.
 */
object ParquetCompact {

  private def paths(path: String): (Path, Path, Path) =
    (new Path(path), new Path(path + ".__compact_tmp"),
      new Path(path + ".__compact_old"))

  /** Repair any half-finished swap from a crashed prior run. */
  private def recover(fs: FileSystem, live: Path, tmp: Path,
                      old: Path): Unit = {
    if (fs.exists(old)) {
      if (fs.exists(live)) fs.delete(old, true) // swap done, cleanup died
      else {                                    // crash mid-swap: roll back
        require(fs.rename(old, live), s"recover: rename $old -> $live failed")
      }
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)    // stage is always redoable
  }

  private def swap(fs: FileSystem, live: Path, tmp: Path, old: Path): Unit = {
    require(fs.rename(live, old), s"compact: rename $live -> $old failed")
    require(fs.rename(tmp, live), s"compact: rename $tmp -> $live failed")
    fs.delete(old, true)
  }

  /** Run the crash recovery for `path` WITHOUT compacting — for callers
    * whose own preconditions read the live table before any compactVia
    * call runs ([[Dedup.migrateToPartitionedIndex]]): a crash mid-swap
    * from a prior run leaves the live dir renamed away, so a precondition
    * `spark.read.parquet(path)` throws path-not-found before the next
    * compactVia could heal it. Idempotent; no-op on a clean path. */
  def recoverTable(spark: SparkSession, path: String): Unit = {
    val (live, tmp, old) = paths(path)
    recover(live.getFileSystem(spark.sparkContext.hadoopConfiguration),
      live, tmp, old)
  }

  private def compactVia(spark: SparkSession, path: String)
                        (stage: (DataFrame, String) => Unit): Long = {
    val (live, tmp, old) = paths(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, live, tmp, old)
    stage(spark.read.parquet(path), tmp.toString)
    val n = spark.read.parquet(tmp.toString).count()
    swap(fs, live, tmp, old)
    n
  }

  /** Rewrite a flat parquet table into ~`targetFiles` files via the
    * staged swap above. Returns the row count. */
  def table(spark: SparkSession, path: String, targetFiles: Int = 8): Long =
    compactVia(spark, path) { (df, tmpDir) =>
      df.coalesce(targetFiles).write.parquet(tmpDir)
    }

  /** Rewrite a value-partitioned table, preserving its partition layout
    * with one file per partition directory (repartition by the partition
    * column routes each key to exactly one task), via the staged swap.
    * Returns the row count. */
  def partitionedTable(spark: SparkSession, path: String,
                       partitionCol: String): Long =
    compactVia(spark, path) { (df, tmpDir) =>
      df.repartition(col(partitionCol))
        .write.partitionBy(partitionCol).parquet(tmpDir)
    }

  /** Rewrite a table through an arbitrary `derive` transform into a
    * `partitionCol`-partitioned layout, via the same staged swap —
    * the layout-migration primitive ([[Dedup.migrateToPartitionedIndex]]
    * derives the bucket column it partitions by). Returns the row
    * count. */
  def rewritePartitioned(spark: SparkSession, path: String,
                         partitionCol: String)
                        (derive: DataFrame => DataFrame): Long =
    compactVia(spark, path) { (df, tmpDir) =>
      derive(df).write.partitionBy(partitionCol).parquet(tmpDir)
    }

  /** [[rewritePartitioned]] with a MULTI-level partition layout — the
    * epoch-partitioned streaming state nests its bucket dirs inside the
    * `batch=` epoch dirs, so its migration rewrites under two partition
    * columns at once. */
  def rewritePartitionedMulti(spark: SparkSession, path: String,
                              partitionCols: Seq[String])
                             (derive: DataFrame => DataFrame): Long =
    compactVia(spark, path) { (df, tmpDir) =>
      derive(df).write.partitionBy(partitionCols: _*).parquet(tmpDir)
    }

  /** [[rewritePartitioned]] folding EXTRA rows (an append delta) into
    * the rewrite: the staged copy is derive(live ∪ extra), swapped in by
    * the same crash-safe protocol. The caller deletes the extra's source
    * AFTER this returns — a crash between the two leaves the rows
    * doubled (harmless to the dedup probes, which re-distinct candidates
    * and take per-pair best), and the next compaction's dedup step
    * converges it. */
  def rewritePartitionedWith(spark: SparkSession, path: String,
                             partitionCol: String, extra: Option[DataFrame])
                            (derive: DataFrame => DataFrame): Long =
    compactVia(spark, path) { (df, tmpDir) =>
      val merged = extra.fold(df)(e => df.unionByName(e,
        allowMissingColumns = true))
      derive(merged).write.partitionBy(partitionCol).parquet(tmpDir)
    }
}
