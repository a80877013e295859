package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Error side-channel semantics for pipeline stages (reference:
 * pipeline.go:38-43 — a stage returns `(nil, err)` and the error goes to an
 * out-of-band error channel while the stream continues; axon.go:152-155
 * logs and moves on).
 *
 * Spark-native form: a fallible stage marks rows instead of throwing; the
 * stream is then split into (ok, errors) with two cheap filters on the same
 * plan. Errors carry the reason — they can be counted, sampled, or sunk to
 * a dead-letter path (strictly stronger than the reference, which drops the
 * event after logging).
 */
object ErrorChannel {

  val ErrorCol = "__graft_error"

  /**
   * A guard stage: rows failing `requirement` are tagged with `reason`
   * instead of being dropped or failing the job.
   */
  def guard(requirement: Column, reason: String): Pipeline.Stage = df => {
    val base = if (df.columns.contains(ErrorCol)) df
      else df.withColumn(ErrorCol, lit(null).cast("string"))
    base.withColumn(ErrorCol,
      when(col(ErrorCol).isNotNull, col(ErrorCol))
        .when(!coalesce(requirement, lit(false)), lit(reason)))
  }

  /** Guard that `new_values` parses as a JSON object when present. */
  def guardValidJson: Pipeline.Stage =
    guard(col("new_values").isNull ||
      from_json(col("new_values"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)).isNotNull,
      "malformed new_values json")

  /** Split the tagged stream: (clean rows without the tag column, errors). */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val tagged = if (df.columns.contains(ErrorCol)) df
      else df.withColumn(ErrorCol, lit(null).cast("string"))
    (tagged.filter(col(ErrorCol).isNull).drop(ErrorCol),
      tagged.filter(col(ErrorCol).isNotNull))
  }
}
