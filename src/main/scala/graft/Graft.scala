package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Changeset
import graft.operators.{Pipeline, TableFilters}
import graft.sources.Replay
import graft.streaming.ChangesetStream

/**
 * The library facade — API parity with the reference's embedding surface
 * (reference: warp_pipe.go:16-51 `NewWarpPipe` + options, :88-90 `Open`,
 * :94-155 `ListenForChanges`; demo usage build/demo-service/main.go:34-66):
 *
 * {{{
 *   val pipe = Graft(spark)
 *     .whitelistTables("public.users", "app.*")
 *     .ignoreTables("app.secrets")
 *     .startFromId(1000)
 *     .withStage(Stages.removeColumn("ssn"))
 *
 *   val live: DataFrame = pipe.changes(changelogDir)       // streaming
 *   val history: DataFrame = pipe.replay(batchChangelog)    // batch
 *   val typed: Dataset[Changeset] = pipe.typedChanges(...)  // Dataset[T]
 * }}}
 *
 * Everything composes the same building blocks the contract queries use;
 * the facade only fixes the wiring order the reference guarantees
 * (whitelist → ignore → user stages, config.go:29-31).
 */
final case class Graft(
    spark: SparkSession,
    config: GraftConfig = GraftConfig(),
    stages: Seq[Pipeline.Stage] = Nil) {

  def withConfig(c: GraftConfig): Graft = copy(config = c)

  def whitelistTables(patterns: String*): Graft =
    copy(config = config.copy(whitelistTables = patterns))

  def ignoreTables(patterns: String*): Graft =
    copy(config = config.copy(ignoreTables = patterns))

  def startFromId(id: Long): Graft =
    copy(config = config.copy(startFromId = Some(id)))

  /** LR-mode resume point (config.go:39-41): keep changes from messages
    * AFTER the one whose `nextlsn` equals the recorded token. Malformed
    * tokens fail here, loudly, not silently inside a column expression.
    * Also selects LR mode — like the reference, the LSN resume point only
    * governs logical-replication streams (an audit changelog configured
    * with mode=audit ignores it and keeps its id/ts resume). */
  def startFromLsn(lsn: String): Graft =
    copy(config = config.copy(mode = "lr",
      startFromLsn = Some(sources.Wal2Json.requireValidLsn(lsn))))

  /** Append a user pipeline stage (reference: RunWithPipeline, axon.go:176-179). */
  def withStage(stage: Pipeline.Stage): Graft = copy(stages = stages :+ stage)

  /** The composed transform applied to every change stream. */
  def transform: Pipeline.Stage = Pipeline(
    (Seq(
      TableFilters.whitelist(config.whitelistTables),
      TableFilters.ignore(config.ignoreTables)) ++ stages): _*)

  def startFromTimestamp(ts: String): Graft =
    copy(config = config.copy(startFromTs = Some(ts)))

  /** Whether the LSN resume point governs this changelog: LR mode only
    * (config.go:24-27 — startFromLsn is read in LR mode), with the lsn
    * column present. Without the mode gate, the streaming source's
    * lsn-aware read schema would manufacture a null lsn column for
    * audit changelogs and silently disable the configured id/ts resume. */
  private def lsnResumes(changelog: DataFrame): Boolean =
    config.mode == "lr" && config.startFromLsn.isDefined &&
      changelog.columns.contains("lsn")

  /** Keep only changes strictly after the configured LSN token (LR-decoded
    * changelogs carry an `lsn` column — Wal2Json.decode; a changelog
    * without one ignores the LSN resume point, matching the reference
    * where startFromLsn applies to LR mode only). Rows with a NULL or
    * unparseable lsn are KEPT — a row that cannot be positioned must not
    * be silently dropped (at-least-once bias; the id-based filters remain
    * available for exact resumes). */
  private def afterLsn(changelog: DataFrame): DataFrame =
    config.startFromLsn match {
      case Some(l) if changelog.columns.contains("lsn") =>
        // re-validate here, not only in the setter: a GraftConfig built
        // directly (bypassing startFromLsn) would otherwise parse to null
        // and `rowLsn > null` silently drops every positioned row — the
        // opposite of the keep-on-unparseable bias for ROW tokens
        sources.Wal2Json.requireValidLsn(l)
        val rowLsn = sources.Wal2Json.lsnToLong(col("lsn"))
        changelog.filter(rowLsn.isNull ||
          rowLsn > sources.Wal2Json.lsnToLong(lit(l)))
      case _ => changelog
    }

  /** Resume-point precedence, identical for batch and streaming: LSN when
    * it governs (LR mode), else id, else timestamp — mirroring the
    * reference's flag precedence. */
  private def resume(changelog: DataFrame): DataFrame =
    if (lsnResumes(changelog)) afterLsn(changelog)
    else config.startFromId.map(id => changelog.filter(col("id") >= id))
      .orElse(config.startFromTs.map(ts =>
        changelog.filter(col("ts") >= lit(ts).cast("timestamp"))))
      .getOrElse(changelog)

  /** Batch replay of a changelog (ts resumes keep the reference's
    * (ts, id) replay order, changeset_store.go:153-189; all others are
    * id-ordered). */
  def replay(changelog: DataFrame): DataFrame = {
    val r = resume(changelog)
    val ordered =
      if (!lsnResumes(changelog) && config.startFromId.isEmpty &&
        config.startFromTs.isDefined) r.orderBy(col("ts"), col("id"))
      else r.orderBy(col("id"))
    transform(ordered)
  }

  /** Live micro-batch stream from a changelog directory. The source reads
    * the `lsn` column exactly when an LSN resume point is configured, so
    * the same precedence applies as in [[replay]]. */
  def changes(changelogDir: String, maxFilesPerTrigger: Int = 10): DataFrame =
    transform(resume(ChangesetStream.fromFiles(spark, changelogDir,
      maxFilesPerTrigger,
      withLsn = config.mode == "lr" && config.startFromLsn.isDefined)))

  /** Typed view of a change stream. */
  def typedChanges(cs: DataFrame): Dataset[Changeset] = {
    import spark.implicits._
    transform(cs).select(
      col("id"), col("ts"), col("action"), col("schema_name"),
      col("table_name"), col("relid"), col("new_values"), col("old_values"))
      .as[Changeset]
  }
}
