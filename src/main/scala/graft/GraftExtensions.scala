package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.Md5Prefix28

/**
 * SparkSessionExtensions entry point: registers the engine's native
 * expressions for SQL use. Activate with
 * `spark.sql.extensions=graft.GraftExtensions` (or call
 * [[GraftExtensions.register]] on a live session).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.md5Prefix28Descriptor)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[graft] val md5Prefix28Descriptor = (
    FunctionIdentifier("md5_prefix28"),
    new ExpressionInfo(classOf[Md5Prefix28].getName, "md5_prefix28"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "md5_prefix28 expects one argument")
      Md5Prefix28(children.head)
    })

  /** Register on an already-running session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix28", exprs => Md5Prefix28(exprs.head), "scala_udf")
    ()
  }
}
