package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Batch interval join via time-binning — the scale-safe form of
 * `l JOIN r ON l.key = r.key AND r.ts BETWEEN l.ts+lo AND l.ts+hi`.
 *
 * A plain range join keys the shuffle on `key` alone and applies the time
 * window as a post-join filter: a hot key (one user with millions of
 * events, one tenant, one null-ish default) materializes its FULL pair
 * space on one task before filtering. Binning adds the time dimension to
 * the join key: the right side lands in `span`-wide bins, the left side
 * explodes to the (at most 2) bins its window can touch, and the
 * equi-join runs on (key, bin) — the per-task pair space is bounded by
 * what can actually match in time, not by the key's total history. The
 * exact window predicate then prunes the bin-edge false positives.
 *
 * This is the batch complement of the streaming
 * [[graft.streaming.StreamOps.intervalJoin]] (which gets the same effect
 * from watermark-bounded state).
 *
 * Timestamps are integer microseconds; `div` is TRUNCATING integer
 * division (toward zero) on both engines (Spark's IntegralDivide and
 * DuckDB's `//` agree), so bin assignment is exact — no double arithmetic
 * near bin edges. For negative timestamps truncation differs from floor
 * (bins straddling zero are wider), but binning only needs to be monotone
 * and IDENTICAL on both join sides; the exact window predicate re-filters,
 * so bin placement never affects results. Do not rely on floor alignment.
 */
object IntervalJoin {

  def binned(left: DataFrame, right: DataFrame, keyCols: Seq[String],
             ltsCol: String, rtsCol: String, loUs: Long, hiUs: Long): DataFrame = {
    require(hiUs >= loUs, s"empty window [$loUs, $hiUs]")
    require(ltsCol != rtsCol,
      "left/right timestamp columns must be named differently")
    val w = math.max(1L, hiUs - loUs + 1) // bin width = window span
    val lb = left.withColumn("__bin",
      explode(sequence(expr(s"($ltsCol + $loUs) div $w"),
        expr(s"($ltsCol + $hiUs) div $w"))))
    val rb = right.withColumn("__bin", expr(s"$rtsCol div $w"))
    lb.join(rb, (keyCols :+ "__bin").toSeq)
      .filter(col(rtsCol) >= col(ltsCol) + loUs &&
        col(rtsCol) <= col(ltsCol) + hiUs)
      .drop("__bin")
  }
}
