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

  /** Resolution of the mixing/upsampling hash slots: rates are honored to
    * 1/MixM. Kept modest so every acceptance test stays in exact LONG
    * arithmetic — with weights ≤ 1000 the products below stay inside
    * 2^63 up to ~9×10^11 rows per domain. */
  val MixM = 10000L

  /**
   * Corpus mixing: deterministically DOWN-sample each domain so the
   * output follows the target proportions — the "data mixture" step of a
   * training pipeline (e.g. rebalance a web-heavy crawl to a prescribed
   * web/wiki/code split). Weights are relative integers (e.g.
   * en→50, de→25, fr→25); domains absent from `targets` are dropped.
   *
   * The bottleneck domain — the one with the least data relative to its
   * target — is kept whole (rate 1), every other domain down-samples to
   * match; no row is ever duplicated (see [[upsampleByWeight]] for the
   * >1× direction). Selection is by key hash: reproducible across
   * engines/layouts, and a pure integer comparison —
   * `(h % M) · c_d · p* < p_d · c* · M` — so both engines agree exactly
   * (no floating-point rate).
   *
   * Scale shape: one tiny per-domain count aggregate; the bottleneck row
   * and the per-domain counts broadcast back; the corpus itself is a
   * single scan + filter, no shuffle.
   */
  def mixToProportions(df: DataFrame, domainCol: Column, keyCol: Column,
                       targets: Map[String, Long]): DataFrame = {
    require(targets.nonEmpty, "empty target mix")
    require(targets.values.forall(w => w > 0 && w <= 1000),
      "weights must be in 1..1000 (relative proportions)")
    val pOf = element_at(typedLit(targets), domainCol.cast("string"))
    // counts feeds BOTH the broadcast join and the bottleneck row — no
    // cross-branch CSE in Spark, so materialize the (tiny) aggregate once
    // instead of re-running the corpus scan for each branch
    val counts = df.filter(pOf.isNotNull)
      .groupBy(domainCol.cast("string").as("__dom"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__p", element_at(typedLit(targets), col("__dom")))
      .localCheckpoint(false)
    // the bottleneck domain: max p/c — deterministic tiebreak on name
    val star = counts
      .orderBy((col("__p").cast("double") / col("__c")).desc, col("__dom"))
      .limit(1)
      .select(col("__c").as("__cstar"), col("__p").as("__pstar"))
    df.join(broadcast(counts), domainCol.cast("string") === col("__dom"))
      .crossJoin(broadcast(star))
      .filter(
        pmod(Md5Prefix28(keyCol.cast("string")), lit(MixM)) *
          col("__c") * col("__pstar") <
          col("__p") * col("__cstar") * lit(MixM))
      .drop("__dom", "__c", "__p", "__cstar", "__pstar")
  }

  /**
   * Token-budget data selection: greedily keep the highest-`scoreCol`
   * rows until the running token total reaches `budget` — the "select
   * the best N tokens of the corpus" step of curriculum / quality-first
   * training-data construction. A row is kept iff the EXCLUSIVE
   * cumulative token count of all strictly-better rows is `< budget`
   * (first-fit greedy in (score desc, key asc) order — a total order, so
   * the selected set is deterministic and engine-reproducible).
   *
   * Scale shape — a RANGE-PARTITIONED two-phase prefix sum: rows are
   * range-partitioned on (score desc, key asc), each partition window-
   * sums its own contiguous slice of the global order, and the ~P
   * partition totals prefix-sum on one tiny frame (the only serial
   * work) and broadcast back as per-partition bases. Range partitioning
   * balances rows per task for ANY score distribution — constant or
   * two-valued scores are split by the key tie-breaker, so no single
   * task ever holds the whole corpus (a score-binned scheme would
   * collapse degenerate distributions into one bin). Partition
   * boundaries only shape the plan; the kept set equals the
   * global-order definition exactly.
   *
   * Returns the selected rows plus `__cum_before` (tokens admitted
   * before this row) for audit.
   *
   * NULL scores are EXCLUDED up front — an unscored row cannot be
   * ranked, and dropping them explicitly beats the silent alternatives.
   */
  def selectByBudget(df: DataFrame, keyCol: Column, scoreCol: Column,
                     nTokCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget=$budget")
    // range-partition in the global admit order; the materialized
    // partition id then keys both prefix phases. spark_partition_id is
    // nondeterministic-flagged, so pin it in its own projection.
    val ranged = df.filter(scoreCol.isNotNull)
      .withColumn("__tok", nTokCol.cast("long"))
      .repartitionByRange(scoreCol.desc, keyCol.asc)
      .withColumn("__pid", spark_partition_id())
      // checkpoint is CORRECTNESS here, not just cost: both consumers
      // must see the SAME materialized pid assignment — a recomputation
      // could re-sample different range boundaries per branch
      .localCheckpoint(false)
    val bases = ranged.groupBy(col("__pid"))
      .agg(sum(col("__tok")).as("__pt"))
      .withColumn("__base",
        coalesce(sum(col("__pt")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__pid").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__base"))
    val w = Window.partitionBy(col("__pid"))
      .orderBy(scoreCol.desc, keyCol.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .join(broadcast(bases), Seq("__pid"))
      .withColumn("__cum_before",
        col("__base") + coalesce(sum(col("__tok")).over(w), lit(0L)))
      .filter(col("__cum_before") < budget)
      .drop("__pid", "__tok", "__base")
  }

  /**
   * Group-wise [[selectByBudget]]: each group (language, domain,
   * curriculum stage) gets its OWN token budget, all groups selected in
   * one pass — the per-domain form of mixture construction. `budgets`
   * is a tiny frame of `groupCols :+ "budget"` (broadcast); groups
   * ABSENT from it select nothing, by construction of the inner join.
   *
   * Same range-partitioned two-phase prefix as the global form, group-
   * scoped: the range order is (group, score desc, key), so each
   * group's rows stay contiguous across partitions; per-(group, pid)
   * running sums + a per-group prefix over its ≤P partition totals.
   * No task ever holds a whole group, for any score distribution.
   */
  def selectByBudgetBy(df: DataFrame, groupCols: Seq[String],
                       keyCol: Column, scoreCol: Column, nTokCol: Column,
                       budgets: DataFrame): DataFrame = {
    require(groupCols.nonEmpty, "selectByBudgetBy needs group columns")
    val g = groupCols.map(col)
    val ranged = df.filter(scoreCol.isNotNull)
      .withColumn("__tok", nTokCol.cast("long"))
      .repartitionByRange((g.map(_.asc) :+ scoreCol.desc :+ keyCol.asc): _*)
      .withColumn("__pid", spark_partition_id())
      // correctness, as in selectByBudget: one boundary sample for both
      // consumers
      .localCheckpoint(false)
    val bases = ranged.groupBy((g :+ col("__pid")): _*)
      .agg(sum(col("__tok")).as("__pt"))
      .withColumn("__base",
        coalesce(sum(col("__pt")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(g: _*).orderBy(col("__pid").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((g :+ col("__pid") :+ col("__base")): _*)
    val w = Window.partitionBy((g :+ col("__pid")): _*)
      .orderBy(scoreCol.desc, keyCol.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // null-safe (<=>) group joins: a NULL group key is a group like any
    // other (the oracle's PARTITION BY keeps a NULL partition, and
    // packOffsetsBy sets the same precedent) — a plain equi-join would
    // silently drop NULL-group rows even when budgets carries a NULL row
    val basesN = bases.select(
      (groupCols.map(c => col(c).as("__bg_" + c)) :+
        col("__pid").as("__bpid") :+ col("__base")): _*)
    val budgetsN = budgets.select(
      (groupCols.map(c => col(c).as("__tg_" + c)) :+ col("budget")): _*)
    ranged
      .join(broadcast(basesN),
        groupCols.map(c => col(c) <=> col("__bg_" + c)).reduce(_ && _) &&
          col("__pid") === col("__bpid"))
      .join(broadcast(budgetsN),
        groupCols.map(c => col(c) <=> col("__tg_" + c)).reduce(_ && _))
      .withColumn("__cum_before",
        col("__base") + coalesce(sum(col("__tok")).over(w), lit(0L)))
      .filter(col("__cum_before") < col("budget"))
      .drop((Seq("__pid", "__bpid", "__tok", "__base", "budget") ++
        groupCols.map("__bg_" + _) ++ groupCols.map("__tg_" + _)): _*)
  }

  /**
   * Deterministic weighted UP-sampling: replicate each row
   * `weightPermille/1000` times — integral copies always, plus one more
   * with probability (weight mod 1000)/1000 decided by the key hash
   * (e.g. 2500 ≙ 2.5×: two copies, half the keys get a third). The
   * multi-epoch/mixture-weights counterpart of [[mixToProportions]]'
   * down-only sampling; together they realize an arbitrary target mix.
   *
   * Emits `copy_idx` (0-based) so downstream shuffles/splits can tell
   * copies apart. Integer weights keep the fractional test exact on both
   * engines. Pure map + generate — no shuffle; rows with 0 copies drop.
   */
  def upsampleByWeight(df: DataFrame, keyCol: Column,
                       weightPermille: Column): DataFrame = {
    // clamp at 0: a computed weight dipping negative must DROP the row
    // (like the oracle's floor division does), not emit hash-decided
    // copies via truncation-toward-zero + a positive pmod remainder
    val w = greatest(weightPermille.cast("long"), lit(0L))
    val extra = (pmod(Md5Prefix28(keyCol.cast("string")), lit(1000L)) <
      pmod(w, lit(1000L))).cast("long")
    val n = (w / 1000).cast("long") + extra
    df.withColumn("__n", n)
      .withColumn("copy_idx",
        explode(when(col("__n") > 0, sequence(lit(0L), col("__n") - 1))
          .otherwise(array())))
      .drop("__n")
  }

  /**
   * Deterministic global shuffle into training shards — the last step of
   * a corpus-construction pipeline ("shuffle the corpus, write N shards,
   * each internally shuffled"). Every row gets a `shard` (0-based) and a
   * `pos` (0-based dense rank inside its shard); both are pure functions
   * of (seed, key): stable under repartition, engine-reproducible, and
   * re-runnable — the properties `DataFrame.orderBy(rand(seed))` lacks
   * (rand is layout-dependent) and a global sort pays a range-exchange
   * this shape avoids.
   *
   * Execution: ONE hash shuffle (the window's partitionBy on `shard`)
   * plus a per-shard sort on the 28-bit key hash — no global ordering,
   * no driver coordination, so it scales with executors. Each shard
   * lands wholly in one task: size `shards` so a shard fits a task
   * (e.g. ~256 MB–1 GB of payload per shard at 100 TB ⇒ 100k–400k
   * shards), which is also what a training loader wants. Ties on the
   * 28-bit hash break by the key itself, keeping `pos` total and
   * deterministic even across hash collisions.
   *
   * PRECONDITIONS: the key must be NON-NULL (a null key raises at
   * execution — silently hashing all nulls to one slot would both
   * collide them and diverge from a SQL oracle, where `NULL || s` is
   * NULL) and should be UNIQUE per row — rows sharing an exact key
   * value tie completely, so which of them takes which adjacent `pos`
   * is layout-dependent (every other row's placement is unaffected).
   */
  def shardShuffle(df: DataFrame, keyCol: Column, shards: Int,
                   seed: String): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    // case-INSENSITIVE reservation check: withColumn resolves
    // case-insensitively under the default spark.sql.caseSensitive, so
    // a caller's "POS" would be silently replaced past an exact-case
    // guard
    val reserved = Set("shard", "pos", "__h", "__shard")
    val taken = df.columns
      .filter(c => reserved.contains(c.toLowerCase(java.util.Locale.ROOT)))
    require(taken.isEmpty,
      s"shardShuffle emits shard/pos (via __h/__shard): input already has ${taken.mkString(", ")}")
    val keyStr = when(keyCol.isNotNull, keyCol.cast("string"))
      .otherwise(raise_error(lit("shardShuffle: null shard key")))
    val h = Md5Prefix28(concat_ws(":", lit(seed), keyStr))
    val w = Window.partitionBy(col("__shard"))
      .orderBy(col("__h"), keyCol)
    df.withColumn("__h", h)
      .withColumn("__shard", pmod(col("__h"), lit(shards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("bigint"))
      .withColumnRenamed("__shard", "shard")
      .drop("__h")
  }
}
