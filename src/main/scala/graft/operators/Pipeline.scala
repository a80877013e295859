package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The transform pipeline (reference: pipeline.go:38-89 — an ordered chain of
 * stages with pass/transform/drop semantics, one goroutine + channel hop per
 * stage).
 *
 * Spark-first re-expression: a stage is just `DataFrame => DataFrame` and the
 * pipeline is function composition via `df.transform(...)`. Catalyst fuses
 * the whole chain into one whole-stage-codegen'd operator — there is no
 * per-stage handoff cost, and filter stages are pushed down/combined by the
 * optimizer (`CombineFilters`, `PushDownPredicates`), which subsumes the
 * reference's "dropped event skips remaining stages" short-circuit
 * (pipeline.go:22-26).
 */
object Pipeline {
  type Stage = DataFrame => DataFrame

  /** Compose stages left-to-right (reference: Pipeline.AddStage order). */
  def apply(stages: Stage*): Stage =
    df => stages.foldLeft(df)((acc, s) => s(acc))
}

/**
 * Table-pattern filters (reference: warp_pipe.go:97-144). Patterns are
 * `schema.table`, `schema.*`, or bare `table`; ignore takes precedence over
 * whitelist by running as a later stage (reference: config.go:29-31
 * "takes precedent").
 */
object TableFilters {

  /** Compile one pattern to a Column predicate over (schema_name, table_name). */
  def patternPredicate(pattern: String): Column = pattern.split("\\.", 2) match {
    case Array(schema, "*")   => col("schema_name") === schema
    case Array(schema, table) => col("schema_name") === schema && col("table_name") === table
    case Array(table)         => col("table_name") === table
    case _                    => lit(false)
  }

  private def matchesAny(patterns: Seq[String]): Column =
    patterns.map(patternPredicate).reduceOption(_ || _).getOrElse(lit(false))

  /** Keep only events whose table matches any pattern (warp_pipe.go:97-120). */
  def whitelist(patterns: Seq[String]): Pipeline.Stage =
    df => if (patterns.isEmpty) df else df.filter(matchesAny(patterns))

  /** Drop events whose table matches any pattern (warp_pipe.go:122-144);
   *  apply AFTER whitelist so ignore wins. */
  def ignore(patterns: Seq[String]): Pipeline.Stage =
    df => if (patterns.isEmpty) df else df.filter(!matchesAny(patterns))
}

/**
 * User-stage building blocks over the JSON `new_values` payload — the Spark
 * equivalents of the reference's canonical pipeline-test stages
 * (pipeline_test.go:15-40: project away a PII column, rewrite a field, drop
 * by value predicate) and of by-name column access
 * (changeset.go:46-74 GetNewColumnValue / GetPreviousColumnValue).
 *
 * All of these are pure Column expressions — codegen'd, no UDFs.
 */
object Stages {

  import org.apache.spark.sql.types.{MapType, StringType}

  /** new_values as map<string,string> for by-name access (T9). */
  def newValuesMap: Column =
    from_json(col("new_values"), MapType(StringType, StringType))

  def oldValuesMap: Column =
    from_json(col("old_values"), MapType(StringType, StringType))

  /** GetNewColumnValue(name) (changeset.go:46-54). */
  def newValue(name: String): Column = get_json_object(col("new_values"), s"$$.$name")

  /** GetPreviousColumnValue(name) (changeset.go:66-74). */
  def oldValue(name: String): Column = get_json_object(col("old_values"), s"$$.$name")

  /**
   * T6 — projection: remove a column from the payload (the reference's
   * `remove_pii` stage, pipeline_test.go:15-26). Done with `map_filter`, a
   * built-in higher-order function.
   */
  def removeColumn(name: String): Pipeline.Stage = df =>
    df.withColumn("new_values",
      when(col("new_values").isNotNull,
        to_json(map_filter(newValuesMap, (k, _) => k =!= name))))

  /**
   * T7 — value map: rewrite a top-level changeset field (the reference's
   * `uppercase_tablename` stage, pipeline_test.go:28-31).
   */
  def mapColumn(name: String, f: Column => Column): Pipeline.Stage =
    df => df.withColumn(name, f(col(name)))

  /**
   * T8 — drop by payload predicate (the reference's `filter_is_test` stage,
   * pipeline_test.go:33-40: drop events whose payload column is TRUE).
   * Null-safe: events without the column pass through.
   */
  def dropWhere(pred: Column): Pipeline.Stage =
    df => df.filter(!coalesce(pred, lit(false)))

  /** T10 — kind normalization (changeset.go:21-33): case-insensitive
   *  INSERT/UPDATE/DELETE, unknown → ''. */
  def normalizeKind: Pipeline.Stage = df =>
    df.withColumn("action",
      when(upper(col("action")).isin("INSERT", "UPDATE", "DELETE"),
        upper(col("action"))).otherwise(lit("")))
}
