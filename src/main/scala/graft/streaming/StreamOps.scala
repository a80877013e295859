package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming relational capabilities over the changeset/event stream —
 * the operations the reference cannot express at all (SURVEY §2.5 lists
 * streaming windows/state as a declared capability extension).
 *
 * All of these run identically on batch frames (Spark's unified engine),
 * which is how their semantics are oracle-checked; the streaming tests
 * drive them through real micro-batch execution.
 */
object StreamOps {

  /**
   * At-least-once → exactly-once event dedup inside a watermark window:
   * duplicates of the same changeset id arriving within the watermark are
   * dropped (the reference's duplicate-insert skip, pushed to the stream
   * edge). On a streaming frame requires `withWatermark` upstream.
   */
  def dedupWithinWatermark(cs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    cs.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("id")

  /** Batch-equivalent dedup (same key). */
  def dedupBatch(cs: DataFrame): DataFrame = cs.dropDuplicates("id")

  /**
   * Stream-stream interval join: enrich each event with the user's signup
   * event when it happened within `intervalMinutes` before the event —
   * the streaming cousin of [[graft.operators.AsOfJoin]] (which is the
   * unbounded-history batch form).
   *
   * Both sides must carry event-time watermarks when streaming.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   intervalMinutes: Int): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col("r.ts") <= col("l.ts") &&
        col("r.ts") >= col("l.ts") - expr(s"INTERVAL $intervalMinutes MINUTES"))
  }
}
