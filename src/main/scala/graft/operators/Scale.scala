package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Scale utilities: the mechanical pieces of the 100 TB story that don't
 * belong to any single operator.
 *
 *  - [[Salting]]: hot-key mitigation for aggregations — two-phase
 *    aggregate over a salted key. AQE's skew-join handling covers joins;
 *    aggregations over a pathological key distribution (one user producing
 *    half the events) still need explicit salting.
 *  - [[BucketedState]]: persist materializer state bucketed by PK so the
 *    state side of every future merge pre-shuffles once at write time —
 *    repeated merges then shuffle only the (much smaller) incoming batch.
 */
object Salting {

  /**
   * Two-phase aggregation with salting: groupBy(keys :+ salt) computes
   * partial aggregates (spreading a hot key over `buckets` reducers), then
   * the tiny partial result re-aggregates by the real keys.
   *
   * `partialAggs` must be re-aggregable (sum/count/min/max/bit_xor…);
   * pass the matching `finalAggs` over the partial columns.
   */
  def saltedAgg(df: DataFrame, keys: Seq[Column], buckets: Int,
                partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    salted
      .groupBy((keys :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys: _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}

object BucketedState {

  /**
   * Write a DataFrame as a bucketed table (sorted within buckets by the
   * PK). A subsequent equi-join/merge on the PK against another table
   * bucketed the same way needs NO shuffle on this side.
   */
  def write(df: DataFrame, tableName: String, pkCol: String,
            numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    // a crashed prior run can leave the managed location behind without
    // catalog metadata; clear it so overwrite is truly idempotent
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + tableName.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) { fs.delete(loc, true); () }
    df.write.mode("overwrite")
      .bucketBy(numBuckets, pkCol)
      .sortBy(pkCol)
      .format("parquet")
      .saveAsTable(tableName)
  }

  def read(spark: org.apache.spark.sql.SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
