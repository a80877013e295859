package graft

/**
 * Env-driven configuration (reference: config.go:53-69 + internal/cli —
 * `WP_*`-prefixed variables with flag overrides; ignore takes precedence
 * over whitelist, config.go:29-31).
 */
case class GraftConfig(
    mode: String = "audit",              // "lr" | "audit" (config.go:24-27)
    startFromLsn: Option[String] = None, // LR resume point (config.go:39-41)
    startFromId: Option[Long] = None,    // audit resume point (config.go:42-44)
    startFromTs: Option[String] = None,  // audit resume point (config.go:45-46)
    whitelistTables: Seq[String] = Nil,
    ignoreTables: Seq[String] = Nil,
    logLevel: String = "info")

object GraftConfig {
  val Prefix = "GRAFT_"

  private val LogLevels =
    Set("trace", "debug", "info", "warn", "error", "fatal", "panic")

  /** Shared with the CLI flag path so flag and env validation agree. */
  def validLogLevel(l: String): Boolean = LogLevels(l)

  /** Parse from an environment map (injectable for tests). */
  def fromEnv(env: Map[String, String] = sys.env): GraftConfig = {
    def get(k: String) = env.get(Prefix + k).map(_.trim).filter(_.nonEmpty)
    def list(k: String) =
      get(k).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    GraftConfig(
      mode = get("MODE").map(_.toLowerCase).filter(Set("lr", "audit"))
        .getOrElse("audit"),
      startFromLsn = get("START_FROM_LSN")
        .map(sources.Wal2Json.requireValidLsn), // fail loudly, not silently
      startFromId = get("START_FROM_ID").flatMap(s => s.toLongOption),
      startFromTs = get("START_FROM_TIMESTAMP"),
      whitelistTables = list("WHITELIST_TABLES"),
      ignoreTables = list("IGNORE_TABLES"),
      logLevel = get("LOG_LEVEL").map(_.toLowerCase).filter(LogLevels)
        .getOrElse("info"))
  }
}

/**
 * V7 — capture table-list resolution (reference: db/schema.go:165-214):
 * include ∪ (catalog scan) minus exclude, where tables without a primary
 * key cannot be captured (db/schema.go:86-89).
 */
object TableList {
  /** @param catalog  all (schema, table) pairs visible in the source
    * @param pks      tables that have a primary key
    * @param include  explicit includes (empty = whole catalog)
    * @param exclude  excludes (win over includes)
    */
  def resolve(catalog: Seq[(String, String)], pks: Set[(String, String)],
              include: Seq[(String, String)], exclude: Seq[(String, String)])
      : Either[String, Seq[(String, String)]] = {
    val base = if (include.isEmpty) catalog else include
    val selected = base.filterNot(exclude.contains).distinct
    val missingPk = selected.filterNot(pks.contains)
    if (missingPk.nonEmpty)
      Left(s"tables without primary key cannot be captured: " +
        missingPk.map { case (s, t) => s"$s.$t" }.mkString(", "))
    else Right(selected)
  }
}
