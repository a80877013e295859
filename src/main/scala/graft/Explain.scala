package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print the formatted physical plan of named contract
  * queries (all of them if none named) at a given SF dir. Drives the
  * PLANS.md audits.
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.01 events_resample ..."
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <sfDir> [query ...]")
    val sfDir = args.head
    val names = if (args.length > 1) args.tail.toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"(unknown query $n)")
      }
    }
    spark.stop()
  }
}
