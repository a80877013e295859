package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for training pipelines: lay every document's tokens out
 * on one contiguous stream (in a deterministic global order) and cut the
 * stream every `budget` tokens — GPT-style packing, where documents
 * straddle window boundaries and no padding is wasted. The operator
 * computes each document's [start_tok, start_tok+n) span and the training
 * window its first token lands in.
 *
 * The global running sum is built WITHOUT a global single-task window — the
 * classic two-phase distributed prefix sum:
 *
 *  1. rows hash into `buckets` ordered buckets (md5 of the key — the same
 *     engine-reproducible hash the dedup/sampling family uses); a window
 *     per bucket computes within-bucket running sums (one shuffle, all
 *     buckets in parallel);
 *  2. the `buckets` bucket TOTALS — a tiny frame — prefix-sum on a single
 *     task and broadcast back as per-bucket base offsets.
 *
 * Global order is (bucket, key): deterministic, layout-independent, and at
 * 100 TB the only serial work is over `buckets` rows.
 */
object Packing {

  def packOffsets(df: DataFrame, keyCol: Column, nTokCol: Column,
                  buckets: Int = 32, budget: Int = 1024): DataFrame =
    packOffsetsBy(df.withColumn("__nogroup", lit(0)), Seq("__nogroup"),
      keyCol, nTokCol, buckets, budget)
      .drop("__nogroup")

  /**
   * Group-wise packing: each group (language, domain, curriculum stage —
   * the shard key of a real training mix) gets its OWN contiguous token
   * stream and window numbering, all groups in one pass.
   *
   * Same two-phase prefix sum, group-scoped: phase-1 windows partition by
   * (group, bucket); the per-(group, bucket) totals prefix-sum inside each
   * group (a `groups × buckets` frame — small, broadcast back). The only
   * serial work per group is over `buckets` rows, and no single task ever
   * holds a group's token stream.
   */
  def packOffsetsBy(df: DataFrame, groupCols: Seq[String], keyCol: Column,
                    nTokCol: Column, buckets: Int = 32,
                    budget: Int = 1024): DataFrame = {
    require(buckets > 0 && budget > 0 && groupCols.nonEmpty)
    val gnames = groupCols.map(col)
    val base = df.select(gnames ++ Seq(keyCol.as("__k"),
      nTokCol.cast("long").as("__n"),
      pmod(Md5Prefix28(keyCol.cast("string")), lit(buckets.toLong)).as("__b")): _*)
    // phase 1: within-(group, bucket) inclusive running sum
    val w = Window.partitionBy(gnames :+ col("__b"): _*).orderBy(col("__k"))
    val cum = base.withColumn("__cum", sum(col("__n")).over(w))
    // phase 2: (group, bucket) totals -> exclusive base offsets within the
    // group (groups × buckets rows; broadcast)
    val bases = base.groupBy(gnames :+ col("__b"): _*)
      .agg(sum(col("__n")).as("__t"))
      .withColumn("__base",
        coalesce(sum(col("__t")).over(Window.partitionBy(gnames: _*)
          .orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(gnames ++ Seq(col("__b"), col("__base")): _*)
    // null-safe join keys: a NULL group (e.g. lang unknown) is a valid
    // partition — a plain equi-join would silently drop those documents
    val joinCond = (groupCols :+ "__b")
      .map(n => col(s"c.$n") <=> col(s"bs.$n")).reduce(_ && _)
    cum.alias("c").join(broadcast(bases.alias("bs")), joinCond)
      .select(groupCols.map(n => col(s"c.$n")) ++
        Seq(col("c.__k").as("key"), col("c.__n").as("n_tokens"),
          (col("bs.__base") + col("c.__cum") - col("c.__n")).as("start_tok")): _*)
      .withColumn("bin_id", (col("start_tok") / budget).cast("long"))
  }
}
