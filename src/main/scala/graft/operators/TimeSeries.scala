package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series shaping over event streams: gap-filled resampling, per-key
 * rolling frames, and fixed-domain pivots. The reference replays event
 * history into downstream stores (internal/pipeline; changeset_store.go
 * replay paths); these are the standard analytic re-shapes a consumer
 * runs on that history, expressed as single-shuffle Spark plans.
 *
 * Scale notes:
 *  - `resample` shuffles once on the bucket id; the gap-fill spine is
 *    generated from a one-row bounds aggregate and its size is
 *    `span / every` — a function of TIME RANGE, not data volume, so it
 *    stays metadata-scale at 100 TB (a year of minutes is ~526k rows).
 *  - `rollingStats` is one window shuffle on the partition keys. Frames
 *    are ROWS-bounded (size k), so state per key is O(k) — no unbounded
 *    window growth on hot keys.
 *  - `pivotCounts` takes the pivot domain EXPLICITLY: Spark's
 *    `pivot(col)` without values runs an extra distinct scan to discover
 *    the domain and caps it at `spark.sql.pivotMaxValues`; passing the
 *    domain keeps the plan a single hash aggregate.
 */
object TimeSeries {

  /** Floor `tsUs` to `everyUs` buckets. `pmod` keeps the result a true
    * floor for negative timestamps too (remainder is non-negative). */
  def bucketUs(tsUs: Column, everyUs: Long): Column = {
    require(everyUs > 0, s"everyUs=$everyUs must be > 0")
    tsUs - pmod(tsUs, lit(everyUs))
  }

  /**
   * Downsample to `everyUs` buckets with an unbroken bucket spine:
   * aggregates `aggExprs` per bucket, then left-joins onto
   * `sequence(minBucket, maxBucket, every)` so silent gaps become
   * explicit rows (aggregate columns NULL; callers pick fill semantics).
   * Output: `bucket_us` + the aggregate columns.
   */
  def resample(df: DataFrame, tsUs: Column, everyUs: Long,
               aggExprs: Seq[Column]): DataFrame = {
    require(aggExprs.nonEmpty, "resample needs at least one aggregate")
    val bucketed = df.withColumn("bucket_us", bucketUs(tsUs, everyUs))
    val perBucket = bucketed.groupBy(col("bucket_us"))
      .agg(aggExprs.head, aggExprs.tail: _*)
    // bounds from the already-reduced perBucket frame, not the raw input:
    // Spark reuses the bucket-agg exchange (one input scan total) and the
    // bounds agg runs over bucket-count rows
    val spine = perBucket.agg(min(col("bucket_us")).as("__lo"),
        max(col("bucket_us")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"), lit(everyUs)))
        .as("bucket_us"))
    spine.join(perBucket, Seq("bucket_us"), "left")
  }

  /**
   * Per-key rolling stats over the trailing `nRows` rows (current row
   * inclusive): appends `roll_n`, `roll_sum`, `roll_avg`. `orderBy` MUST
   * be a total order within each partition (pass a tie-breaker id) or
   * frame contents are nondeterministic. `value` is decimal-promoted
   * before summing so the rolling sum is order-insensitive and
   * engine-exact (same device as the q1 aggregates).
   */
  def rollingStats(df: DataFrame, partitionBy: Seq[Column],
                   orderBy: Seq[Column], value: Column,
                   nRows: Int): DataFrame = {
    require(nRows >= 1, s"nRows=$nRows must be >= 1")
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
      .rowsBetween(-(nRows - 1), Window.currentRow)
    df.withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_sum",
        sum(value.cast("decimal(18,6)")).over(w).cast("double"))
      .withColumn("roll_avg", col("roll_sum") / col("roll_n"))
  }

  /**
   * Pivot `pivotCol` over the EXPLICIT `domain` into per-group counts,
   * columns named `n_<value>`. Values outside the domain are dropped
   * (same as Spark's pivot contract); absent (group, value) cells are 0,
   * not NULL.
   *
   * Implemented as conditional aggregation, not `Dataset.pivot`: with a
   * known domain the counts are plain `count(when(...))` columns — ONE
   * map-side-combined shuffle on the group key. (`pivot` plans two:
   * groupBy(group, pivot) then a pivotfirst re-aggregate; without
   * explicit values it adds a third domain-discovery scan.)
   */
  def pivotCounts(df: DataFrame, groupBy: Column, pivotCol: Column,
                  domain: Seq[String]): DataFrame = {
    require(domain.nonEmpty, "pivotCounts needs an explicit pivot domain")
    val aggs = domain.map(v => count(when(pivotCol === v, 1)).as(s"n_$v"))
    df.groupBy(groupBy).agg(aggs.head, aggs.tail: _*)
  }
}
