package graft.functions

import org.apache.spark.sql.SparkSession
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
 * Crash-safe order, as in compactState: the consolidated rows are
 * MATERIALIZED (eager localCheckpoint) before the overwrite of the very
 * files they were read from. A crash mid-overwrite loses no source data
 * beyond that table's own rewrite window; re-running converges.
 * Single-writer discipline: no concurrent probe/append on the path.
 */
object ParquetCompact {

  /** Rewrite a flat parquet table in place into ~`targetFiles` files.
    * Returns the row count. */
  def table(spark: SparkSession, path: String, targetFiles: Int = 8): Long = {
    val all = spark.read.parquet(path).coalesce(targetFiles)
      .localCheckpoint() // eager: materialize BEFORE overwriting the source
    val n = all.count()
    all.write.mode("overwrite").parquet(path)
    n
  }

  /** Rewrite a value-partitioned table in place, preserving its
    * partition layout with one file per partition directory (repartition
    * by the partition column routes each key to exactly one task).
    * Returns the row count. */
  def partitionedTable(spark: SparkSession, path: String,
                       partitionCol: String): Long = {
    val all = spark.read.parquet(path).repartition(col(partitionCol))
      .localCheckpoint() // eager, as above
    val n = all.count()
    all.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    n
  }
}
