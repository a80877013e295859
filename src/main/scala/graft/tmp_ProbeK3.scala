// probe: time k3k4k5_apply_merge and a few neighbors at sf0.1, 3 reps
import org.apache.spark.sql.SparkSession
object ProbeK3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    for (q <- Seq("k3k4k5_apply_merge", "merge_incremental", "k6_materialize_latest", "dedup_ngram_jaccard"); rep <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"PROBE $q rep$rep ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
