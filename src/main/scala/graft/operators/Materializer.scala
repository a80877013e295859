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

  /**
   * Exact per-key ordered reduction of a batch's events to one outcome,
   * entirely in aggregate expressions (no per-row JVM objects):
   *
   * Let B be the key's LAST non-INSERT event (max id of UPDATE/DELETE).
   * Serial semantics imply:
   *  - no B (only INSERTs): outcome depends on prior state — carry the
   *    sorted insert list (`prefixIns`) and resolve at merge time (the
   *    first insert newer than the state version applies iff the key is
   *    not live);
   *  - B is UPDATE: key is live with B's payload; every later INSERT is
   *    dup-skipped → outcome (present, B.value, B.id);
   *  - B is DELETE: the first INSERT after B (if any) re-creates the key →
   *    (present, ins.value, ins.id); otherwise (absent, B.id).
   *
   * One shuffle on the key: the window and the groupBy share the hash
   * partitioning, and all aggregates are min/max/collect — map-side
   * combinable.
   */
  private def reduceBatch(spark: SparkSession, batch: DataFrame,
                          pkCol: String): DataFrame = {
    val keyed = batch
      // unknown kinds are skipped, as the reference's dispatcher does
      // (axon.go:277-286 default case logs and drops the event)
      .filter(col("action").isin("INSERT", "UPDATE", "DELETE"))
      .withColumn("__pk",
        coalesce(get_json_object(col("new_values"), s"$$.$pkCol"),
                 get_json_object(col("old_values"), s"$$.$pkCol")))
      .filter(col("__pk").isNotNull)
    val w = Window.partitionBy(col("__pk"))
    val withB = keyed.withColumn("__bid",
      max(when(col("action") =!= "INSERT", col("id"))).over(w))
    val agged = withB.groupBy(col("__pk").as("pk")).agg(
      max(when(col("action") =!= "INSERT",
        struct(col("id").as("id"), col("action").as("action"),
          col("new_values").as("nv")))).as("b"),
      min(when(col("action") === "INSERT" && col("id") > col("__bid"),
        struct(col("id").as("id"), col("new_values").as("nv")))).as("postIns"),
      sort_array(collect_list(
        when(col("action") === "INSERT" && col("__bid").isNull,
          struct(col("id").as("id"), col("new_values").as("nv")))))
        .as("prefixIns"))
    agged.select(
      col("pk"),
      col("b").isNotNull.as("determined"),
      (col("b.action") === "UPDATE" || col("postIns").isNotNull).as("present"),
      when(col("b.action") === "UPDATE", col("b.nv"))
        .when(col("postIns").isNotNull, col("postIns.nv")).as("value"),
      when(col("b.action") === "UPDATE", col("b.id"))
        .when(col("postIns").isNotNull, col("postIns.id"))
        .otherwise(col("b.id")).as("version"),
      col("prefixIns"))
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

    val sv = coalesce(col("s." + VersionCol), lit(-1L))
    val sLive = col("s." + pkCol).isNotNull &&
      !coalesce(col("s." + TombstoneCol), lit(true))

    // Parse each payload ONCE into an aliased struct column — referencing
    // `from_json(...).getField(c)` per output field would inline one full
    // JSON parse per column into the projection (round-2 plan audit found
    // 24 from_json calls here). CollapseProject keeps non-cheap producers
    // referenced more than once in their own projection, so each row now
    // parses at most two payloads (outcome value + serial-position insert).
    val joined = state.alias("s").join(
      reduced.alias("c"), col("s." + pkCol) === col("__key"), "full_outer")
      // first prefix INSERT newer than the state version (serial position);
      // try_element_at: the filtered array is legitimately empty when every
      // insert is stale, and this column is evaluated for every row
      .withColumn("__firstIns",
        try_element_at(filter(col("prefixIns"), x => x.getField("id") > sv),
          lit(1)))
      .withColumn("__valRow", from_json(col("value"), rowSchema))
      .withColumn("__insRow",
        from_json(col("__firstIns").getField("nv"), rowSchema))

    // Branch conditions (evaluation order is the serial-apply contract).
    val untouched = col("__key").isNull // untouched state row
    val applies = col("determined") && col("version") > sv
    val insertApplies =
      !col("determined") && !sLive && col("__firstIns").isNotNull
    val stale = col("s." + pkCol).isNotNull // stale batch / dup-skip

    // Row-kept predicate stated over the CHEAP branch conditions. A
    // batch-only key (no state row) always resolves when it is determined
    // or has a serial-position insert (state version is -1 there, so
    // `version > sv` always holds).
    val keep = untouched || stale || col("determined") ||
      col("__firstIns").isNotNull

    // Output columns as PER-COLUMN scalar CASE chains instead of one
    // struct-valued CASE: extraction does not push through CaseWhen, so a
    // downstream filter on e.g. the tombstone column would otherwise
    // inline the whole struct CASE — json parses included — into its
    // Filter node and evaluate it twice per row (currentView does exactly
    // that filter).
    def outCol(c: String): Column =
      when(untouched, col("s." + c))
        .when(applies,
          if (c == pkCol) coalesce(col("s." + c), col("__key"))
          else when(!col("present"), col("s." + c))
            .otherwise(col("__valRow").getField(c)))
        .when(insertApplies,
          if (c == pkCol) coalesce(col("s." + c), col("__key"))
          else col("__insRow").getField(c))
        .when(stale, col("s." + c))

    val versionOut = when(untouched, col("s." + VersionCol))
      .when(applies, col("version"))
      .when(insertApplies, col("__firstIns").getField("id"))
      .when(stale, col("s." + VersionCol))
    val tombOut = when(untouched, col("s." + TombstoneCol))
      .when(applies, !col("present"))
      .when(insertApplies, lit(false))
      .when(stale, col("s." + TombstoneCol))

    joined.filter(keep).select(
      (rowSchema.fieldNames.toSeq.map(c => outCol(c).as(c)) :+
        versionOut.as(VersionCol) :+ tombOut.as(TombstoneCol)): _*)
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
   * State compaction (the state-side complement of K11 retention):
   * tombstones older than `horizon` can be garbage-collected once no
   * in-flight batch can carry an event with a smaller id — they exist only
   * to fence stale re-deliveries. Live rows are never dropped.
   */
  def compactState(state: DataFrame, horizon: Long): DataFrame =
    state.filter(!col(TombstoneCol) || col(VersionCol) >= horizon)

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
   * Materialize the final state of one table from its full changelog —
   * exact serial semantics from an empty state. With no prior state the
   * per-key outcomes resolve directly (no state join): a determined
   * present key keeps its payload; an all-INSERT key keeps its FIRST
   * insert (later ones are dup-skipped against it).
   */
  def materialize(changelog: DataFrame, pkJsonPath: String,
                  rowSchema: StructType): DataFrame = {
    val reduced = reduceBatch(changelog.sparkSession, changelog, pkJsonPath)
    reduced
      .select(
        when(col("determined") && col("present"), col("value"))
          .when(!col("determined") && size(col("prefixIns")) > 0,
            element_at(col("prefixIns"), 1).getField("nv"))
          .as("__v"))
      .filter(col("__v").isNotNull)
      .select(from_json(col("__v"), rowSchema).as("r"))
      .select(col("r.*"))
  }

  /**
   * SCD Type-2 history: every applied change becomes a VERSION row with a
   * validity interval in changeset-id space — the materialization a
   * warehouse keeps when it wants point-in-time reads, not just current
   * state (the reference only ever materializes current state; this is the
   * natural extension over the same changelog).
   *
   *  - valid_from = the change's id; valid_to = the id of the key's next
   *    change of ANY kind (a DELETE closes the last interval), null while
   *    open; is_current marks open intervals.
   *  - DELETE events emit no row themselves — they only terminate.
   *  - This is the EVENT LOG's history: a duplicate INSERT on a live key
   *    (which the serial apply dup-skips, axon_sql.go:133-146) still
   *    appears as a version here. Run the changelog through
   *    [[mergeVersioned]] first if dup-skipped events must not version.
   *
   * One shuffle on the PK (the lead window); the payload parses once per
   * emitted row. Point-in-time query: `WHERE valid_from <= id AND
   * (valid_to IS NULL OR id < valid_to)`.
   */
  def scd2History(changelog: DataFrame, pkCol: String,
                  rowSchema: StructType): DataFrame = {
    val keyed = changelog
      .filter(col("action").isin("INSERT", "UPDATE", "DELETE"))
      .withColumn("__pk",
        coalesce(get_json_object(col("new_values"), s"$$.$pkCol"),
                 get_json_object(col("old_values"), s"$$.$pkCol")))
      .filter(col("__pk").isNotNull)
    val w = Window.partitionBy(col("__pk")).orderBy(col("id"))
    keyed
      .withColumn("__valid_to", lead(col("id"), 1).over(w))
      .filter(col("action") =!= "DELETE")
      .withColumn("__r", from_json(col("new_values"), rowSchema))
      .select((rowSchema.fieldNames.toSeq.map(c =>
        col("__r").getField(c).as(c)) :+
        col("id").as("valid_from") :+
        col("__valid_to").as("valid_to") :+
        col("__valid_to").isNull.as("is_current")): _*)
  }

  /**
   * Point-in-time read over a [[scd2History]] frame: the version of each
   * key visible AT changeset id `asof` — `valid_from <= asof < valid_to`
   * (open intervals qualify). `asofBound` is a one-row frame with a
   * single `__asof` column so the bound may be data-derived (e.g. the
   * stream midpoint) without a driver-side collect; it broadcasts, the
   * history never shuffles for the selection.
   */
  def scd2AsOf(history: DataFrame, asofBound: DataFrame): DataFrame =
    history.crossJoin(broadcast(asofBound))
      .filter(col("valid_from") <= col("__asof") &&
        (col("valid_to").isNull || col("__asof") < col("valid_to")))
      .drop("__asof", "is_current")

  /** Per-table spec for [[materializeAll]]. */
  case class TableSpec(pkCol: String, rowSchema: StructType)

  /**
   * Materialize EVERY table of a mixed changelog (the axon worker's whole
   * job, axon.go:49-173: replay one audit stream, apply per table).
   * Returns (schema, table) → final state. Each table's slice filters by
   * (schema_name, table_name) — the filter pushes into the shared scan, so
   * tables materialize independently and in parallel.
   */
  def materializeAll(changelog: DataFrame,
                     tables: Map[(String, String), TableSpec])
      : Map[(String, String), DataFrame] =
    tables.map { case ((schema, table), spec) =>
      val slice = changelog.filter(
        col("schema_name") === schema && col("table_name") === table)
      (schema, table) -> materialize(slice, spec.pkCol, spec.rowSchema)
    }
}
