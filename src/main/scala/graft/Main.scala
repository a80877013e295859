package graft

import org.apache.spark.sql.SparkSession

/**
 * CLI daemon (reference: cmd/warp-pipe + internal/cli/warp_pipe.go —
 * configure from env, open the stream, print each change as JSON to
 * stdout until interrupted; `--once` ≅ ShutdownAfterLastChangeset).
 *
 * Flag surface mirrors internal/cli/warp_pipe.go:39-52 with
 * config.go:10-50 precedence: env config first, then any SET flag
 * overrides its env counterpart (unset flags leave env values intact).
 *
 * Usage:
 * {{{
 *   GRAFT_WHITELIST_TABLES=public.users \
 *   sbt "runMain graft.Main <changelogDir> [--once]
 *     [--mode lr|audit] [--start-from-lsn L] [--start-from-id N]
 *     [--start-from-ts TS] [--whitelist-tables a,b] [--ignore-tables c]
 *     [--log-level warn]"
 * }}}
 */
object Main {

  /** Apply CLI flag overrides onto an (env-derived) config — flag wins,
    * matching the reference's parseConfig (internal/cli/config.go:10-50).
    * Fails loudly on unknown flags and missing/invalid values. Returns
    * the updated config plus the non-flag positional args. */
  def applyFlags(cfg: GraftConfig, args: Seq[String]): (GraftConfig, Seq[String]) = {
    def list(v: String) = v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    @annotation.tailrec
    def go(rest: List[String], c: GraftConfig,
           pos: List[String]): (GraftConfig, List[String]) = rest match {
      case Nil => (c, pos.reverse)
      case flag :: tail if flag.startsWith("--") && flag != "--once" =>
        tail match {
          // a flag in the value position means the value was omitted —
          // fail instead of silently consuming the next flag as a value
          // (e.g. `--whitelist-tables --log-level warn` capturing zero
          // tables while "warn" becomes a stray positional)
          case v :: _ if v.startsWith("--") =>
            sys.error(s"$flag requires a value, got flag '$v'")
          case v :: t2 =>
            val next = flag match {
              case "--mode" | "--replication-mode" =>
                val m = v.toLowerCase
                require(Set("lr", "audit")(m), s"unknown mode '$v' (lr|audit)")
                c.copy(mode = m)
              case "--start-from-lsn" =>
                // selects LR mode like Graft.startFromLsn — the LSN resume
                // point only governs logical-replication streams
                c.copy(mode = "lr",
                  startFromLsn = Some(sources.Wal2Json.requireValidLsn(v)))
              case "--start-from-id" =>
                c.copy(startFromId = Some(v.toLongOption.getOrElse(
                  sys.error(s"--start-from-id: not a long: '$v'"))))
              case "--start-from-ts" => c.copy(startFromTs = Some(v))
              case "--whitelist-tables" => c.copy(whitelistTables = list(v))
              case "--ignore-tables" => c.copy(ignoreTables = list(v))
              case "--log-level" =>
                // same validation the env path applies (Config.scala) —
                // but loud, per the flag contract, not a silent fallback
                val l = v.toLowerCase
                require(GraftConfig.validLogLevel(l),
                  s"unknown log level '$v'")
                c.copy(logLevel = l)
              case other => sys.error(s"unknown flag: $other")
            }
            go(t2, next, pos)
          case Nil => sys.error(s"$flag requires a value")
        }
      case a :: tail => go(tail, c, if (a == "--once") pos else a :: pos)
    }
    val (c, pos) = go(args.toList, cfg, Nil)
    (c, pos)
  }

  def main(args: Array[String]): Unit = {
    val once = args.contains("--once")
    val (cfg, positional) = applyFlags(GraftConfig.fromEnv(), args.toSeq)
    require(positional.nonEmpty,
      "usage: graft.Main <changelogDir> [--once] [flags]")
    val dir = positional.head

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
