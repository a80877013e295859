package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Md5SignBits}

class Md5SignBitsSpec extends AnyFunSuite {
  import SparkTestSession._

  /** The composed-builtin formulation the native expression replaces (and
    * the DuckDB oracles still use): bit j tests hex digit j%32 against
    * nibble-bit table j/32. */
  private def hexFormulation(bits: Int) =
    (0 until bits).map { j =>
      when(substring(md5(col("s")), j % 32 + 1, 1)
        .isin(Dedup.simhashBitChars(j / 32): _*), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  test("native sign bits equal the substring/IN formulation (24, 48, 63)") {
    val d = sources.Tables.load(spark, sfDir, "documents").limit(200)
      .select(col("text").as("s"))
    for (bits <- Seq(24, 48, 63)) {
      val cmp = d.select(Md5SignBits(col("s"), bits).as("native"),
        hexFormulation(bits).as("hex"))
      assert(cmp.filter(col("native") =!= col("hex")).count() == 0,
        s"mismatch at bits=$bits")
    }
    import spark.implicits._
    val edge = Seq("", "a", "é中文", "x" * 500).toDF("s")
    val cmp2 = edge.select(Md5SignBits(col("s"), 48).as("native"),
      hexFormulation(48).as("hex"))
    assert(cmp2.filter(col("native") =!= col("hex")).count() == 0)
  }

  test("SQL registration: md5_sign_bits and topk_agg via extensions hook") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT md5_sign_bits('abc', 48) AS sig").collect().head
    val expect = spark.range(1)
      .select(Md5SignBits(lit("abc"), 48)).collect().head.getLong(0)
    assert(r.getLong(0) == expect)
    val t = spark.sql(
      "SELECT topk_agg(CAST(id AS DOUBLE), id, 2) AS top FROM range(10)")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(e => (e.getDouble(0), e.getLong(1)))
    assert(t.toList == List((9.0, 9L), (8.0, 8L)))
    // non-string input fails at analysis, not as a Janino/execution error
    val ex = intercept[Exception] {
      spark.sql("SELECT md5_sign_bits(id, 24) FROM range(3)").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("md5_sign_bits"), ex.getMessage)
  }

  test("generated code compiles inside WholeStageCodegen, null passes through") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val df = spark.range(64)
      .select(Md5SignBits(concat(lit("doc-"), col("id").cast("string")), 48).as("h"))
    assert(df.queryExecution.executedPlan.exists {
      case _: WholeStageCodegenExec => true
      case _ => false
    })
    val wscg = df.queryExecution.executedPlan.collectFirst {
      case w: WholeStageCodegenExec => w
    }.get
    val (_, source) = wscg.doCodeGen()
    assert(source.body.contains("Md5SignBits$.MODULE$.eval"),
      "generated code must call through the MODULE$ forwarder")
    assert(df.collect().length == 64)

    import spark.implicits._
    val rows = Seq(Some("abc"), None).toDF("s")
      .select(Md5SignBits(col("s"), 24).as("h")).collect()
    assert(rows.count(_.isNullAt(0)) == 1)
  }
}
