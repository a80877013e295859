package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-provided testdata layout. */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet has carried TIMESTAMP(NANOS) in some driver rounds,
    // which Spark only reads as a long (ns since epoch) behind this legacy
    // flag; other rounds generate TIMESTAMP(MICROS). [[tsUs]] normalizes
    // either at the edge.
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    spark.read.parquet(s"${sfDir.stripSuffix("/")}/$name.parquet")
  }

  /**
   * `events.ts` as microseconds-since-epoch, robust to the physical type
   * the driver generated that round: TIMESTAMP(NANOS) surfaces as a long
   * of nanos (integer-divide — a double division would lose precision
   * above 2^53), TIMESTAMP(MICROS) as a (NTZ) timestamp. The NTZ→TZ cast
   * is value-preserving because every session here pins UTC, matching
   * DuckDB's `epoch_us` on the same file.
   */
  def tsUs(df: DataFrame): org.apache.spark.sql.Column =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => unix_micros(col("ts"))
    }
}

/**
 * Batch changelog sources: read a changeset stream (audit-table shape, see
 * [[graft.model.ChangesetSchema]]) from storage, plus derivations of
 * changelogs from the driver testdata used by tests/oracles.
 *
 * Scale notes: all of these are plain parquet scans — filters and column
 * pruning push down to the scan, and the derivations below are narrow
 * (no shuffle).
 */
object Changelog {

  /**
   * Derive a changeset stream from the `events` table (TESTDATA.md maps
   * `events` ≅ the audit stream: monotonic `event_id` ≅ changeset `id`,
   * `event_type` ≅ `action`, `props` ≅ `new_values`).
   *
   * Mapping is deterministic so DuckDB oracles can reproduce it:
   *  - action: signup→INSERT, error→DELETE, everything else→UPDATE
   *  - schema_name: 'public' for even user_id, 'app' for odd
   *  - table_name: the event_type (gives the table filters something to chew)
   *  - new_values: JSON of {user_id, event_type, k, value} (NULL for DELETE)
   *  - old_values: JSON of {user_id} (NULL for INSERT)
   */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = Tables.load(spark, sfDir, "events")
    val ev = raw.withColumn("ts", timestamp_micros(Tables.tsUs(raw)))
    val payload = to_json(struct(
      col("user_id"),
      col("event_type"),
      get_json_object(col("props"), "$.k").cast("int").as("k"),
      col("value")
    ))
    val oldPayload = to_json(struct(col("user_id")))
    val action = when(col("event_type") === "signup", lit("INSERT"))
      .when(col("event_type") === "error", lit("DELETE"))
      .otherwise(lit("UPDATE"))
    ev.select(
      col("event_id").as("id"),
      col("ts"),
      action.as("action"),
      when(col("user_id") % 2 === 0, "public").otherwise("app").as("schema_name"),
      col("event_type").as("table_name"),
      lit(16385L).as("relid"),
      when(action =!= "DELETE", payload).as("new_values"),
      when(action =!= "INSERT", oldPayload).as("old_values")
    )
  }

  /**
   * Synthetic insert/update/delete changelog over `orders` — the apply/merge
   * test fixture (SURVEY §5: derive a synthetic `changesets` table from base
   * tables for apply/merge tests). Deterministic script:
   *  - every order: INSERT at id = o_orderkey*3 with the original row
   *  - o_orderkey % 3 == 0: UPDATE at id = o_orderkey*3+1 with
   *    o_totalprice+1000.0 and status 'U'
   *  - o_orderkey % 7 == 0: DELETE at id = o_orderkey*3+2
   * Materializing this changelog must therefore yield: all orders with
   * o_orderkey % 7 != 0; totalprice+1000 and status 'U' where % 3 == 0.
   */
  def ordersScript(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    def payload(price: org.apache.spark.sql.Column,
                status: org.apache.spark.sql.Column) = to_json(struct(
      col("o_orderkey"), col("o_custkey"), status.as("o_orderstatus"),
      price.as("o_totalprice"), col("o_orderpriority")
    ))
    val keyJson = to_json(struct(col("o_orderkey")))
    val ins = o.select(
      (col("o_orderkey") * 3).as("id"), col("o_orderdate").as("ts"),
      lit("INSERT").as("action"), lit("public").as("schema_name"),
      lit("orders").as("table_name"), lit(16390L).as("relid"),
      payload(col("o_totalprice"), col("o_orderstatus")).as("new_values"),
      lit(null).cast("string").as("old_values"))
    val upd = o.filter(col("o_orderkey") % 3 === 0).select(
      (col("o_orderkey") * 3 + 1).as("id"), col("o_orderdate").as("ts"),
      lit("UPDATE").as("action"), lit("public").as("schema_name"),
      lit("orders").as("table_name"), lit(16390L).as("relid"),
      payload(col("o_totalprice") + 1000.0, lit("U")).as("new_values"),
      keyJson.as("old_values"))
    val del = o.filter(col("o_orderkey") % 7 === 0).select(
      (col("o_orderkey") * 3 + 2).as("id"), col("o_orderdate").as("ts"),
      lit("DELETE").as("action"), lit("public").as("schema_name"),
      lit("orders").as("table_name"), lit(16390L).as("relid"),
      lit(null).cast("string").as("new_values"),
      keyJson.as("old_values"))
    ins.unionByName(upd).unionByName(del)
  }
}

/**
 * Replay/seek over a changeset stream (reference:
 * internal/store/changeset_store.go:114-189 — `GetSinceID`,
 * `GetSinceTimestamp`, `GetByID`).
 *
 * The reference pages LIMIT 500/OFFSET (O(n²) server work,
 * changeset_store.go:16-18); here each is a single predicate that Catalyst
 * pushes into the scan (parquet min/max row-group pruning, or JDBC WHERE) —
 * strictly better and embarrassingly parallel.
 */
object Replay {
  import org.apache.spark.sql.Column

  /** Changes with id >= fromId, in id order (changeset_store.go:114-150). */
  def sinceId(changelog: DataFrame, fromId: Long): DataFrame =
    changelog.filter(col("id") >= fromId).orderBy(col("id"))

  /** Changes with ts >= fromTs, ordered (changeset_store.go:153-189). */
  def sinceTimestamp(changelog: DataFrame, fromTs: Column): DataFrame =
    changelog.filter(col("ts") >= fromTs).orderBy(col("ts"), col("id"))

  /** Point lookup (changeset_store.go:67-78). */
  def byId(changelog: DataFrame, id: Long): DataFrame =
    changelog.filter(col("id") === id)

  /** Completion detection: the max id in the stream (reference:
   *  warp_pipe.go:169-190 `IsLatestChangeSet`). */
  def maxId(changelog: DataFrame): DataFrame =
    changelog.agg(max(col("id")).as("max_id"))

  /**
   * Retention: drop changes before an id/timestamp (reference:
   * changeset_store.go:191-207 — declared there but a no-op; implemented for
   * real here, as SURVEY §7.3.6 directs).
   */
  def retainFromId(changelog: DataFrame, fromId: Long): DataFrame =
    changelog.filter(col("id") >= fromId)

  def retainFromTimestamp(changelog: DataFrame, fromTs: Column): DataFrame =
    changelog.filter(col("ts") >= fromTs)
}
