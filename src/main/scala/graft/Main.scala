package graft

import org.apache.spark.sql.SparkSession

/**
 * CLI daemon (reference: cmd/warp-pipe + internal/cli/warp_pipe.go —
 * configure from env, open the stream, print each change as JSON to
 * stdout until interrupted; `--once` ≅ ShutdownAfterLastChangeset).
 *
 * Usage:
 * {{{
 *   GRAFT_WHITELIST_TABLES=public.users \
 *   sbt "runMain graft.Main <changelogDir> [--once]"
 * }}}
 */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <changelogDir> [--once]")
    val dir = args(0)
    val once = args.contains("--once")
    val cfg = GraftConfig.fromEnv()

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(cfg.logLevel.toUpperCase match {
      case "TRACE" | "DEBUG" => "INFO"
      case l @ ("WARN" | "ERROR") => l
      case _ => "WARN"
    })

    val pipe = Graft(spark).withConfig(cfg)
    // the reference prints each change as a JSON line on stdout
    // (internal/cli/warp_pipe.go:100-114); same transport here
    val stdout = pipe.changes(dir).writeStream
      .foreach(new streaming.ForeachSinks.PushWriter(line => println(line)))
    val q = (if (once)
      stdout.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else stdout).start()
    q.awaitTermination()
    spark.stop()
  }
}
