package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // fail loudly on codegen compile errors instead of silently
      // interpreting — a silent fallback is a perf regression the bench
      // would otherwise mis-attribute
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: JVM/codegen/session init shouldn't bill the first query
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // min of `reps` runs: a single-shot reading bills one query for JIT /
      // GC / first-codegen noise (round 3 recorded a 4× outlier that way);
      // the minimum is the steady-state cost of the PLAN, which is what
      // the bench compares across rounds
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink forces full materialization of every column (count()
        // would let Spark prune the plan down to a row count)
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          if (!errors.contains(name)) {
            errors += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          }
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
