package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/**
 * Change application / materialization (reference: axon.go — the `axon` sync
 * worker that replays a changeset stream into a target database via
 * INSERT / upsert / DELETE, dispatched per event kind, axon.go:277-286).
 *
 * The reference applies serially, row-at-a-time, one sync SQL round-trip per
 * event. The Spark-native equivalent reduces each micro-batch to ONE
 * per-key outcome and applies it set-oriented against the state table. The
 * reduction is an exact per-key ordered fold of the reference's serial
 * semantics (INSERT skips live keys, UPDATE upserts, DELETE removes) — a
 * plain latest-event-per-key window is NOT sufficient: an INSERT arriving
 * after an UPDATE of the same key within one batch must still be skipped
 * (dup-skip is state-dependent). Property-tested against a serial-apply
 * model in MergeProperties.
 *
 * Delivery contract: with batches applied in stream order (what the
 * checkpointed source provides), the materialized state is exactly the
 * serial-apply state for ANY changelog. Replayed batches are no-ops, and a
 * stale batch arriving after a newer one can never regress newer state
 * (version guard); pathological cross-batch reorderings involving
 * dup-skipped INSERTs converge but may keep the insert the serial order
 * would have skipped — the reference offers nothing at all here (it
 * replays from the slot-creation LSN and trusts idempotent upserts,
 * lr_listener.go:284-299).
 *
 * Scale notes: the fold is one hash-partitioned shuffle on the PK with
 * per-key event counts bounded by batch size; AQE handles skew. `merge` is
 * a full-outer join of state×outcomes on the PK — at 100 TB both sides
 * hash-partition on the same key, and if state is bucketed by PK the
 * shuffle on the state side disappears entirely.
 */
object Materializer {

  /**
   * K6 core: latest event per key by changeset id (window row_number; ids
   * are unique — BIGSERIAL in the reference audit table).
   */
  def latestPerKey(changelog: DataFrame, keyCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(col("id").desc)
    changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Internal state columns for versioned state tables. */
  val VersionCol = "__graft_v"
  val TombstoneCol = "__graft_tombstone"

  /** One prefix INSERT (before the batch's first non-INSERT for the key). */
  case class PrefixIns(id: Long, nv: String)

  /** Per-key fold outcome of one batch. */
  case class Reduced(pk: String, determined: Boolean, present: Boolean,
                     value: String, version: Long, prefixIns: Seq[PrefixIns])

  /**
   * Exact per-key ordered fold of a batch's events (serial semantics).
   * Events whose outcome depends on prior state (a leading run of INSERTs)
   * are carried as `prefixIns` and resolved against the state at merge
   * time; everything from the first UPDATE/DELETE on is state-independent.
   */
  private def reduceBatch(spark: SparkSession, batch: DataFrame,
                          pkCol: String): DataFrame = {
    import spark.implicits._
    val keyed = batch
      .withColumn("__pk",
        coalesce(get_json_object(col("new_values"), s"$$.$pkCol"),
                 get_json_object(col("old_values"), s"$$.$pkCol")))
      .filter(col("__pk").isNotNull)
      .select(col("__pk").as[String], col("id").as[Long],
        col("action").as[String], col("new_values").as[String])
    keyed.groupByKey(_._1).mapGroups { (pk, it) =>
      val evs = it.toSeq.sortBy(_._2)
      var determined = false
      var present = false
      var value: String = null
      var version = -1L
      val prefix = Seq.newBuilder[PrefixIns]
      evs.foreach { case (_, id, action, nv) =>
        if (!determined) action match {
          case "INSERT" => prefix += PrefixIns(id, nv)
          case "UPDATE" =>
            determined = true; present = true; value = nv; version = id
          case "DELETE" =>
            determined = true; present = false; value = null; version = id
          case _ => ()
        } else action match {
          case "INSERT" =>
            if (!present) { present = true; value = nv; version = id }
          case "UPDATE" => present = true; value = nv; version = id
          case "DELETE" => present = false; value = null; version = id
          case _ => ()
        }
      }
      Reduced(pk, determined, present, value, version, prefix.result())
    }.toDF()
  }

  /**
   * Versioned merge: apply one batch to a versioned state table
   * (rowSchema + [[VersionCol]] + [[TombstoneCol]]; bootstrap with
   * [[emptyVersionedState]], read with [[currentView]]).
   */
  def mergeVersioned(state: DataFrame, batch: DataFrame, pkCol: String,
                     rowSchema: StructType): DataFrame = {
    val spark = batch.sparkSession
    val pkType = rowSchema(pkCol).dataType
    val reduced = reduceBatch(spark, batch, pkCol)
      .withColumn("__key", col("pk").cast(pkType))

    val joined = state.alias("s").join(
      reduced.alias("c"), col("s." + pkCol) === col("__key"), "full_outer")

    val sv = coalesce(col("s." + VersionCol), lit(-1L))
    val sLive = col("s." + pkCol).isNotNull &&
      !coalesce(col("s." + TombstoneCol), lit(true))
    // first prefix INSERT newer than the state version (serial position)
    val firstIns = element_at(
      filter(col("prefixIns"), x => x.getField("id") > sv), 1)

    def outRow(value: Column, version: Column, tomb: Column) = struct(
      (rowSchema.fieldNames.map { c =>
        if (c == pkCol)
          coalesce(col("s." + c), col("__key")).as(c)
        else
          when(tomb, col("s." + c))
            .otherwise(from_json(value, rowSchema).getField(c)).as(c)
      } :+ version.as(VersionCol) :+ tomb.as(TombstoneCol)): _*)

    val stateStruct = struct(
      (rowSchema.fieldNames.map(c => col("s." + c)) :+
        col("s." + VersionCol).as(VersionCol) :+
        col("s." + TombstoneCol).as(TombstoneCol)): _*)

    joined.select(
      when(col("__key").isNull, stateStruct) // untouched state
        .when(col("determined") && col("version") > sv,
          outRow(col("value"), col("version"), !col("present")))
        .when(!col("determined") && !sLive && firstIns.isNotNull,
          outRow(firstIns.getField("nv"), firstIns.getField("id"), lit(false)))
        .when(col("s." + pkCol).isNotNull, stateStruct) // stale/dup-skip
        .otherwise(lit(null)).as("r"))
      .filter(col("r").isNotNull)
      .select(col("r.*"))
  }

  def emptyVersionedState(spark: SparkSession, rowSchema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      versionedSchema(rowSchema))

  def versionedSchema(rowSchema: StructType): StructType =
    StructType(rowSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(VersionCol, LongType, nullable = true),
      org.apache.spark.sql.types.StructField(TombstoneCol,
        org.apache.spark.sql.types.BooleanType, nullable = true)))

  /** User-facing view of a versioned state table: live rows, user columns. */
  def currentView(state: DataFrame): DataFrame =
    state.filter(!col(TombstoneCol)).drop(VersionCol, TombstoneCol)

  /**
   * K3/K4/K5 batch merge against a plain (unversioned) state table:
   * insert skips duplicate PKs (axon_sql.go:133-146), update upserts
   * (axon_sql.go:77-106), delete removes by PK (axon_sql.go:108-122).
   * Exact serial semantics via the versioned path with state at version -1.
   */
  def merge(state: DataFrame, batch: DataFrame, pkCol: String,
            rowSchema: StructType): DataFrame = {
    val versioned = state
      .withColumn(VersionCol, lit(-1L))
      .withColumn(TombstoneCol, lit(false))
    currentView(mergeVersioned(versioned, batch, pkCol, rowSchema))
  }

  /**
   * Materialize the final state of one table from its full changelog
   * (exact serial semantics from an empty state).
   */
  def materialize(changelog: DataFrame, pkJsonPath: String,
                  rowSchema: StructType): DataFrame =
    currentView(mergeVersioned(
      emptyVersionedState(changelog.sparkSession, rowSchema),
      changelog, pkJsonPath, rowSchema))
}
