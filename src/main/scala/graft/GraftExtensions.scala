package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

import graft.functions.{Md5Prefix28, Md5SignBits, TopKAgg}

/**
 * SparkSessionExtensions entry point: registers the engine's native
 * expressions for SQL use. Activate with
 * `spark.sql.extensions=graft.GraftExtensions` (or call
 * [[GraftExtensions.register]] on a live session).
 *
 * SQL surface:
 *  - `md5_prefix28(s)` — 28-bit md5 prefix (shingle hashing)
 *  - `md5_sign_bits(s, bits)` — SimHash bit tests as a long word
 *  - `topk_agg(score, id, k)` — bounded top-k aggregate,
 *    (score DESC, id ASC)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("md5_prefix28", classOf[Md5Prefix28].getName, { children =>
      require(children.length == 1, "md5_prefix28 expects one argument")
      Md5Prefix28(children.head)
    }),
    ("md5_sign_bits", classOf[Md5SignBits].getName, { children =>
      require(children.length == 2, "md5_sign_bits expects (str, bits)")
      Md5SignBits(children.head, intLit(children(1), "bits"))
    }),
    ("topk_agg", classOf[TopKAgg].getName, { children =>
      require(children.length == 3, "topk_agg expects (score, id, k)")
      TopKAgg(children(0), children(1), intLit(children(2), "k"))
        .toAggregateExpression()
    }))

  private[graft] val descriptors = builders.map { case (name, clazz, builder) =>
    (FunctionIdentifier(name), new ExpressionInfo(clazz, name), builder)
  }

  /** Register on an already-running session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
