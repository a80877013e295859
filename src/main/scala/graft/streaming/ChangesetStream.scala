package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.model.ChangesetSchema
import graft.operators.Materializer

/**
 * Streaming changeset sources and sinks (reference: the two CDC listeners —
 * lr_listener.go:56-299 and notify_listener.go:37-249 — and the axon apply
 * worker, axon.go:143-173).
 *
 * The reference's delivery model is: pull changes (WAL stream or audit-table
 * tail), push each event through the pipeline, apply serially. The
 * Spark-native equivalent is Structured Streaming micro-batches:
 *
 *  - SOURCE: a file-based changelog stream (each file ≅ a WAL segment; the
 *    checkpointed file offset ≅ the LSN / changeset id the reference makes
 *    the user track by hand, config.go:39-46). A JDBC audit-table tail
 *    plugs in the same way via an id-watermark query per trigger.
 *  - TRANSFORMS: the exact same [[graft.operators.Pipeline]] stages work on
 *    a streaming DataFrame unchanged — that is the point of declaring them
 *    as DataFrame => DataFrame.
 *  - SINK: `foreachBatch` + [[Materializer.merge]] gives idempotent,
 *    effectively-once apply (the reference is at-least-once with idempotent
 *    SQL upserts, axon_sql.go:133-146 — same contract, batched).
 *
 * Delivery semantics: checkpointing makes source progress exactly-once;
 * the merge is idempotent per batch (re-applying a batch is a no-op), so
 * sink output is effectively-once — strictly stronger than the reference
 * (which replays from the slot-creation LSN on restart,
 * lr_listener.go:284-299).
 */
object ChangesetStream {

  /**
   * S1/S2 — streaming changeset source from a changelog directory.
   * `maxFilesPerTrigger` bounds micro-batch size (the reference's analog is
   * its 500-row replay page, changeset_store.go:16-18).
   */
  def fromFiles(spark: SparkSession, dir: String,
                maxFilesPerTrigger: Int = 10,
                withLsn: Boolean = false): DataFrame = {
    // withLsn: LR-decoded changelogs (Wal2Json.decode output) carry an
    // `lsn` column; the pinned read schema must include it or an LSN
    // resume filter downstream would silently see no such column
    val schema =
      if (withLsn) ChangesetSchema.schema.add("lsn",
        org.apache.spark.sql.types.StringType, nullable = true)
      else ChangesetSchema.schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
  }

  /** K1 — console sink (reference: CLI stdout JSON, internal/cli/warp_pipe.go:100-114). */
  def consoleSink(cs: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    cs.writeStream.format("console").outputMode("append")

  /** K1 — JSON file sink. */
  def jsonSink(cs: DataFrame, outDir: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    cs.writeStream.format("json")
      .option("path", outDir).option("checkpointLocation", checkpoint)
      .outputMode("append")

  /**
   * K3-K6 — the materializing sink: per micro-batch, reduce to the latest
   * event per PK and merge into a parquet state table. `AvailableNow`
   * reproduces the reference's ShutdownAfterLastChangeset (K10,
   * warp_pipe.go:169-190): process everything currently captured, then stop.
   */
  def materializeTo(cs: DataFrame, statePath: String, checkpoint: String,
                    pkCol: String, rowSchema: StructType,
                    availableNow: Boolean = true,
                    compactionLag: Option[Long] = None): StreamingQuery = {
    val writer = cs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        // compaction adds a second consumer (min(id) agg) of the batch;
        // cache it so the source files are not read and decoded twice
        val batch = if (compactionLag.isDefined) batch0.cache() else batch0
        val spark = batch.sparkSession
        val dst = new org.apache.hadoop.fs.Path(statePath)
        val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val next = new org.apache.hadoop.fs.Path(statePath + "__next")
        val old = new org.apache.hadoop.fs.Path(statePath + "__old")
        // crash recovery: a completed __next with no dst means a previous
        // swap died between renames — finish it instead of starting empty
        if (!fs.exists(dst) && fs.exists(next)) {
          if (!fs.rename(next, dst))
            sys.error(s"state recovery rename failed: $next -> $dst")
        }
        val state =
          if (fs.exists(dst)) spark.read.parquet(statePath)
          else Materializer.emptyVersionedState(spark, rowSchema)
        // versioned merge: idempotent under batch replay AND safe under
        // out-of-order batch delivery (file discovery order is mod-time
        // based, not id based)
        val merged0 = Materializer.mergeVersioned(state, batch, pkCol, rowSchema)
        // wired-in state compaction: tombstones older than
        // (this batch's min id - lag) are garbage-collected. Safe only
        // under in-stream-order batch delivery — ids below the batch min
        // never reappear, so a dropped tombstone can no longer be needed
        // to fence a stale event. That constraint is ENFORCED, not
        // assumed: the applied horizon persists next to the state, and a
        // batch arriving below it (out-of-order source, e.g. mod-time
        // file ordering with sub-second ties) fails the query loudly
        // instead of silently resurrecting deleted rows.
        val merged = compactionLag match {
          case Some(lag) =>
            Option(batch.agg(min(col("id"))).head().get(0)) match {
              case Some(minId: java.lang.Long) =>
                val persisted = readHorizon(fs, statePath)
                if (minId < persisted)
                  sys.error(
                    s"compaction fence violated: batch min id $minId is " +
                      s"below the persisted compaction horizon $persisted " +
                      "— the source delivered a batch out of stream order " +
                      "and tombstones needed to fence it may already be " +
                      "GC'd. Use compactionLag = None with this source.")
                val h = math.max(persisted, minId - lag)
                // persist BEFORE the state swap: a crash between the two
                // leaves the fence >= what was actually compacted
                // (stricter on replay, never unsafe)
                writeHorizon(fs, statePath, h)
                Materializer.compactState(merged0, h)
              case _ => merged0 // empty batch
            }
          case None => merged0
        }
        // write-then-swap; every rename checked, and the crash window
        // between the two renames is recoverable (see above)
        merged.write.mode("overwrite").parquet(next.toString)
        fs.delete(old, true)
        if (fs.exists(dst) && !fs.rename(dst, old))
          sys.error(s"state swap rename failed: $dst -> $old")
        if (!fs.rename(next, dst))
          sys.error(s"state swap rename failed: $next -> $dst")
        fs.delete(old, true)
        if (compactionLag.isDefined) batch.unpersist(false)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Read the user-facing view of a [[materializeTo]] state table. */
  def readState(spark: SparkSession, statePath: String): DataFrame =
    Materializer.currentView(spark.read.parquet(statePath))

  /** The persisted compaction fence: the id below which tombstones may
    * already be GC'd. Batches must never arrive below it. */
  private def horizonPath(statePath: String) =
    new org.apache.hadoop.fs.Path(statePath + "__horizon")

  private def readHorizon(fs: org.apache.hadoop.fs.FileSystem,
                          statePath: String): Long = {
    val p = horizonPath(statePath)
    if (!fs.exists(p)) Long.MinValue
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(0, buf) finally in.close()
      new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    }
  }

  private def writeHorizon(fs: org.apache.hadoop.fs.FileSystem,
                           statePath: String, h: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(statePath + "__horizon__tmp")
    val out = fs.create(tmp, true)
    try out.write(h.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = horizonPath(statePath)
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      sys.error(s"compaction horizon write failed: $tmp -> $dst")
  }

  /**
   * Event-time windowed aggregation with watermark over the change stream —
   * the natural capability extension the reference lacks entirely
   * (SURVEY §2.5 "Streaming windows").  Works identically on batch frames.
   */
  def windowedCounts(cs: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    cs.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("table_name"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("table_name"), col("cnt"))
}
