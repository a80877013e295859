package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row, the most recent right row with the same
 * key and right.ts <= left.ts.
 *
 * Implementation is the merge-based union+window form, NOT a range join:
 * tag both sides, union, sort within each key by (ts, side) — right rows
 * sort before left rows at equal ts so "at or before" is inclusive — and
 * carry the last non-null right value forward with
 * `last(..., ignoreNulls).over(running window)`.
 *
 * Scale notes: one shuffle on the key, one sort — O(n log n) per key
 * group, no range-join row explosion, no broadcast requirement on either
 * side. This is the plan you want at 100 TB; a custom SparkPlan could only
 * shave the union overhead.
 */
object AsOfJoin {

  /**
   * @param left     rows to enrich
   * @param right    reference stream (e.g. dimension change events)
   * @param keyCols  equality keys present on both sides
   * @param leftTs   left event-time column name (shared name ok)
   * @param rightTs  right event-time column name
   * @param valueCol right column to carry (emitted as `asof_<valueCol>`)
   */
  def lastValue(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                leftTs: String, rightTs: String, valueCol: String): DataFrame = {
    val keyExprs = keyCols.map(col)
    val leftCols = left.columns
    val tagged = right.select(
      (keyExprs :+ col(rightTs).as("__t") :+ lit(0).as("__side") :+
        col(valueCol).as("__val")) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
      .unionByName(left.select(
        (keyExprs :+ col(leftTs).as("__t") :+ lit(1).as("__side") :+
          lit(null).cast(right.schema(valueCol).dataType).as("__val")) ++
          leftCols.filterNot(keyCols.contains).map(col): _*))
    val w = Window.partitionBy(keyExprs: _*).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn(s"asof_$valueCol", last(col("__val"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__val")
  }
}
