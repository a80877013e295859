package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // default 1× cores; override to audit higher parallelism (AQE
    // coalesces the excess, so 4× cores mainly tests skew masking)
    val shufflePartitions = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
      .flatMap(_.toIntOption).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
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
    // malformed env must not abort the bench before any timing is emitted
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption).getOrElse(2))
    // optional comma-separated subset (scale probes re-run a family on
    // replica dirs without paying for the whole suite). An empty value
    // means "all"; unknown names are reported so a typo can't silently
    // produce an empty run that clobbers the last full bench_out.json
    val only = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach(_.diff(SparkEntry.queries.keySet).foreach(n =>
      System.err.println(s"[bench] unknown query in SPARK_GRAFT_BENCH_QUERIES: $n")))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      // min of `reps` SUCCESSFUL runs: a single-shot reading bills one
      // query for JIT / GC / first-codegen noise (round 3 recorded a 4×
      // outlier that way); the minimum is the steady-state cost of the
      // PLAN, which is what the bench compares across rounds. A failed
      // rep's (fast-failure) elapsed must not undercut a real timing.
      val ok = scala.collection.mutable.ArrayBuffer.empty[Double]
      val all = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        // noop sink forces full materialization of every column (count()
        // would let Spark prune the plan down to a row count)
        val succeeded =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            if (!errors.contains(name)) {
              errors += name
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            }
            false
          }
        val t = (System.nanoTime() - t0) / 1e9
        all += t
        if (succeeded) ok += t
      }
      // a query with zero successful reps gets null, not its fast-failure
      // elapsed — a failure latency must never be mistaken for plan cost
      name -> (if (ok.nonEmpty) Some(ok.min) else None)
    }
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + v.map(_.toString).getOrElse("null")
    }.mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // persist the full report: the driver captures a bounded log tail, and
    // a 70-query JSON line is long enough to get head-truncated there
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "bench_out.json")),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write bench_out.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
