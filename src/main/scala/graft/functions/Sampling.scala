package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines (SURVEY §2.6
 * extension set). `DataFrame.sample` is seed-dependent on partition layout
 * and row order — useless for reproducible corpus construction at scale.
 * Both operators here sample by a HASH OF THE KEY, so the selected set is
 * a pure function of the data:
 *
 *  - identical across engines, runs, cluster layouts, and repartitions;
 *  - consistent across tables ("universe sampling": sampling two tables
 *    by the same join key keeps the join complete);
 *  - incremental-friendly: new rows don't change old rows' membership.
 */
object Sampling {

  /** 0..99 hash slot of a key — md5-prefix based, engine-reproducible
    * (same construction as [[Dedup]]'s shingle hashes). */
  private def slot(keyCol: Column): Column =
    pmod(Md5Prefix28(keyCol.cast("string")), lit(100L))

  /**
   * Deterministic ~pct% sample: keep rows whose key hashes into the first
   * `pct` of 100 slots. Pure map — no shuffle, no seed, the filter pushes
   * down next to the scan.
   */
  def hashSample(df: DataFrame, keyCol: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct=$pct out of range")
    df.filter(slot(keyCol) < pct)
  }

  /**
   * Stratified cap: at most `k` rows per group, chosen by hash order of
   * the key — a deterministic "random k" per stratum (class-balancing a
   * skewed corpus, per-domain caps). One shuffle on the group column;
   * the per-group sort is bounded by the group size, and a hot group
   * top-k's via the window's running row_number, never a full collect.
   */
  def stratifiedCap(df: DataFrame, groupCol: Column, keyCol: Column,
                    k: Int): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(Md5Prefix28(keyCol.cast("string")), keyCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Deterministic train/val/test assignment by key hash: slots [0,trainPct)
   * → "train", [trainPct, trainPct+valPct) → "val", the rest → "test".
   * The same universe-sampling properties as [[hashSample]] apply: the
   * split is a pure function of the key — stable under repartition,
   * engine-reproducible, and new rows never move old rows between splits
   * (the property a growing corpus needs so val/test stay untouched).
   * Pure map, no shuffle.
   */
  def splitLabel(keyCol: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split: train=$trainPct val=$valPct")
    val s = slot(keyCol)
    when(s < trainPct, "train")
      .when(s < trainPct + valPct, "val")
      .otherwise("test")
  }
}
