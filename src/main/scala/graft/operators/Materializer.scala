package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Change application / materialization (reference: axon.go — the `axon` sync
 * worker that replays a changeset stream into a target database via
 * INSERT / upsert / DELETE, dispatched per event kind, axon.go:277-286).
 *
 * The reference applies serially, row-at-a-time, one sync SQL round-trip per
 * event. The Spark-native equivalent is the standard CDC materialize
 * pattern (SURVEY §2 K6): within a batch, reduce to the LATEST event per
 * primary key (window over id desc), then apply upserts and deletes in one
 * set-oriented operation. Per-key ordering — the one semantic the reference
 * gets for free by being serial — is restored explicitly by the window.
 *
 * Scale notes: `latestPerKey` is one hash-partitioned shuffle on the PK; AQE
 * handles skewed keys. `merge` is a full-outer join of state×changes on the
 * PK — at 100 TB both sides hash-partition on the same key, and if state is
 * bucketed by PK the shuffle on the state side disappears entirely.
 */
object Materializer {

  /**
   * K6 core: latest event per (schema, table, pk) by changeset id.
   * Uses max_by-style reduction via window row_number; ties broken by id —
   * ids are unique (BIGSERIAL in the reference audit table).
   */
  def latestPerKey(changelog: DataFrame, keyCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(col("id").desc)
    changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Materialize the final state of ONE table from its full changelog:
   * keep the latest event per PK, drop keys whose latest event is DELETE,
   * and decode `new_values` into typed columns with `from_json`.
   *
   * @param pkJsonPath JSON field in new/old_values holding the PK
   * @param rowSchema  typed schema of the table's payload
   */
  def materialize(changelog: DataFrame, pkJsonPath: String,
                  rowSchema: StructType): DataFrame = {
    val keyed = changelog.withColumn("__pk",
      coalesce(get_json_object(col("new_values"), s"$$.$pkJsonPath"),
               get_json_object(col("old_values"), s"$$.$pkJsonPath")))
    latestPerKey(keyed, Seq(col("__pk")))
      .filter(col("action") =!= "DELETE")
      .select(from_json(col("new_values"), rowSchema).as("r"))
      .select(col("r.*"))
  }

  /** Internal state columns for [[mergeVersioned]]. */
  val VersionCol = "__graft_v"
  val TombstoneCol = "__graft_tombstone"

  /**
   * Versioned merge for at-least-once / possibly out-of-order micro-batches
   * (the streaming sink path). State rows carry the changeset id that
   * produced them ([[VersionCol]]) and deletes are kept as tombstones
   * ([[TombstoneCol]]) so that:
   *   - re-applying a batch is a no-op (idempotent at-least-once),
   *   - a batch that arrives late (lower ids) can never overwrite newer
   *     state — the reference gets this by being strictly serial; we get it
   *     by comparing versions,
   *   - INSERT on a live key is skipped (reference dup-skip,
   *     axon_sql.go:133-146) but INSERT after a tombstoned DELETE with a
   *     newer id re-creates the row.
   *
   * `state` must carry rowSchema + version/tombstone columns (bootstrap with
   * [[emptyVersionedState]]); read the user view with [[currentView]].
   */
  def mergeVersioned(state: DataFrame, batch: DataFrame, pkCol: String,
                     rowSchema: StructType): DataFrame = {
    val keyed = batch.withColumn("__pk",
      coalesce(get_json_object(col("new_values"), s"$$.$pkCol"),
               get_json_object(col("old_values"), s"$$.$pkCol")))
    val latest = latestPerKey(keyed, Seq(col("__pk")))
    val pkType = rowSchema(pkCol).dataType
    val decoded = latest.select(
      col("__pk").cast(pkType).as("__key"),
      col("action").as("__action"),
      col("id").as("__bv"),
      from_json(col("new_values"), rowSchema).as("__row"))

    val joined = state.alias("s").join(
      decoded.alias("c"), col("s." + pkCol) === col("__key"), "full_outer")
    val stateStruct = struct(
      (rowSchema.fieldNames.map(c => col("s." + c)) :+
        col("s." + VersionCol).as(VersionCol) :+
        col("s." + TombstoneCol).as(TombstoneCol)): _*)
    val batchStruct = struct(
      (rowSchema.fieldNames.map(c =>
        when(col("__action") === "DELETE",
          // tombstones must keep the key even when there was no prior
          // state row for it (delete-before-insert arrival order)
          if (c == pkCol) coalesce(col("s." + c), col("__key"))
          else col("s." + c))
          .otherwise(col("__row." + c)).as(c)) :+
        col("__bv").as(VersionCol) :+
        (col("__action") === "DELETE").as(TombstoneCol)): _*)
    val live = col("s." + pkCol).isNotNull && !col("s." + TombstoneCol)
    val takeBatch =
      col("s." + pkCol).isNull ||
        (col("__bv") > col("s." + VersionCol) &&
          // dup-skip: INSERT does not touch a live row
          !(col("__action") === "INSERT" && live))
    joined.select(
      when(col("__key").isNull, stateStruct)
        .when(takeBatch, batchStruct)
        .otherwise(stateStruct).as("r"))
      .select(col("r.*"))
  }

  def emptyVersionedState(spark: org.apache.spark.sql.SparkSession,
                          rowSchema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      versionedSchema(rowSchema))

  def versionedSchema(rowSchema: StructType): StructType =
    StructType(rowSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(VersionCol,
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField(TombstoneCol,
        org.apache.spark.sql.types.BooleanType, nullable = true)))

  /** User-facing view of a versioned state table: live rows, user columns. */
  def currentView(state: DataFrame): DataFrame =
    state.filter(!col(TombstoneCol)).drop(VersionCol, TombstoneCol)

  /**
   * K3/K4/K5 batch merge: apply one micro-batch of changes to an existing
   * state table. Insert semantics skip duplicate PKs already in the state
   * (reference: dup-key skip, axon_sql.go:133-146), update is an upsert
   * (axon_sql.go:77-106), delete removes by PK (axon_sql.go:108-122).
   *
   * state and the returned DataFrame share `rowSchema`; `pkCol` names the PK
   * column in the state and in the decoded payload. For out-of-order /
   * at-least-once micro-batch streams use [[mergeVersioned]].
   */
  def merge(state: DataFrame, batch: DataFrame, pkCol: String,
            rowSchema: StructType): DataFrame = {
    val latest = {
      val keyed = batch.withColumn("__pk",
        coalesce(get_json_object(col("new_values"), s"$$.$pkCol"),
                 get_json_object(col("old_values"), s"$$.$pkCol")))
      latestPerKey(keyed, Seq(col("__pk")))
    }
    val pkType = rowSchema(pkCol).dataType
    val decoded = latest.select(
      col("__pk").cast(pkType).as("__key"),
      col("action"),
      from_json(col("new_values"), rowSchema).as("__row"))

    // upserts replace matching state rows; deletes drop them; untouched
    // state rows pass through. INSERT on an existing key keeps the state row
    // (dup-skip); UPDATE on a missing key inserts it (upsert).
    val joined = state.alias("s").join(
      decoded.alias("c"), col("s." + pkCol) === col("__key"), "full_outer")
    joined.select(
      when(col("__key").isNull, struct(state.columns.map(c => col("s." + c)): _*))
        .when(col("action") === "DELETE", lit(null))
        .when(col("action") === "INSERT" && col("s." + pkCol).isNotNull,
          struct(state.columns.map(c => col("s." + c)): _*))
        .otherwise(col("__row")).as("r"))
      .filter(col("r").isNotNull)
      .select(col("r.*"))
  }
}
