package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Consistency verification (reference: axon.go:181-270 `Axon.Verify` — prove
 * source and target tables identical via an ordered, chained-MD5 checksum
 * computed in Postgres: `pg_md5_hashagg` folds `state = md5(state ||
 * md5(row::text))` over rows in PK order, db/schema.go:290-334).
 *
 * Two implementations:
 *
 *  1. [[orderedChecksum]] — exact semantic parity with the reference's
 *     non-commutative fold. Ordered folds are inherently sequential, so this
 *     collapses the (pk, rowhash) pairs into one array and folds with the
 *     `aggregate` higher-order function. Fine for verification-sized
 *     outputs; NOT the 100 TB path.
 *
 *  2. [[commutativeChecksum]] — the scale path: order-independent
 *     (sum + bit_xor + count of per-row hashes), computed with map-side
 *     partial aggregation, no sort, no single-node fold. Two tables are
 *     equal iff all three components match (modulo astronomically unlikely
 *     collisions). This is what you run against 100 TB.
 */
object Checksum {

  /**
   * V3 — row canonicalization: md5 over a '|'-joined canonical text form of
   * the columns (reference: `md5(CAST(row AS TEXT))`, axon.go:242-249).
   * Callers pass explicitly-casted columns so the text form is engine-stable
   * (doubles and timestamps must be cast deliberately; see SURVEY §7.3.1).
   */
  def rowHash(cols: Column*): Column =
    md5(concat_ws("|", cols.map(_.cast("string")): _*))

  /** V1 — the binary step function md5(a || b) (db/schema.go:296-309). */
  def md5Concat(a: Column, b: Column): Column = md5(concat(a, b))

  /**
   * V2 — exact ordered fold: state = md5(state || md5(row)), init '', rows
   * in `orderCol` order (db/schema.go:311-326). Returns a 1-row DataFrame
   * with column `checksum`.
   */
  def orderedChecksum(df: DataFrame, orderCol: Column, rowHash: Column): DataFrame =
    df.select(struct(orderCol.as("k"), rowHash.as("h")).as("p"))
      .agg(sort_array(collect_list(col("p"))).as("ps"))
      .select(aggregate(col("ps"), lit(""),
        (state, x) => md5(concat(state, x.getField("h")))).as("checksum"))

  /**
   * V2 scale path with ORDER-SENSITIVE semantics: two-level chunked chain.
   * Rows are assigned to one of `numChunks` chunks by a HASH of the PK
   * (md5-prefix mod numChunks — deterministic for a given row set and
   * independent of both physical partitioning AND PK density; range-based
   * chunking would degrade to one chunk per row on sparse id domains like
   * snowflake ids). Each chunk folds its row hashes in PK order from ''
   * into a chunk digest; the digests fold in chunk order into the final
   * checksum. Arrays are bounded (~n/numChunks rows per chunk, ≤numChunks
   * digests) — no whole-table collect on one task, unlike
   * [[orderedChecksum]]; size numChunks ≈ sqrt(n) and beyond that nest
   * another level.
   *
   * The chunked chain is a DIFFERENT (but equally deterministic and
   * difference-sensitive) value than the flat chain — md5 chaining cannot
   * be re-bracketed — so both sides of a comparison must use the same
   * scheme and numChunks, exactly as both sides must share the flat
   * scheme today. Any row change, insertion, or deletion flips it.
   */
  def orderedChecksumChunked(df: DataFrame, orderCol: Column, rowHash: Column,
                             numChunks: Int = 4096): DataFrame =
    df.select(pmod(graft.functions.Md5Prefix28(orderCol.cast("string")),
      lit(numChunks.toLong)).as("c"),
      struct(orderCol.as("k"), rowHash.as("h")).as("p"))
      .groupBy(col("c"))
      .agg(sort_array(collect_list(col("p"))).as("ps"))
      .select(col("c"), aggregate(col("ps"), lit(""),
        (state, x) => md5(concat(state, x.getField("h")))).as("d"))
      .agg(sort_array(collect_list(struct(col("c"), col("d")))).as("ds"))
      .select(aggregate(col("ds"), lit(""),
        (state, x) => md5(concat(state, x.getField("d")))).as("checksum"))

  /**
   * Scale-path commutative checksum: (sum of 20-bit hash prefixes,
   * bit_xor of 60-bit hash prefixes, count). 20-bit summands keep the sum
   * inside BIGINT (no ANSI overflow) up to ~8.8e12 rows — comfortably past
   * a 100 TB table; the xor covers the full-width entropy. Map-side
   * combinable → one tiny shuffle.
   */
  def commutativeChecksum(df: DataFrame, rowHash: Column): DataFrame =
    df.select(rowHash.as("h"))
      .agg(
        sum(conv(substring(col("h"), 1, 5), 16, 10).cast("long")).as("hash_sum"),
        expr("bit_xor(cast(conv(substring(h, 1, 15), 16, 10) as bigint))").as("hash_xor"),
        count(lit(1)).as("row_count"))

  /**
   * V4 — table checksum compare (axon.go:181-270): compute the checksum on
   * both sides, return 1 row with both checksums and a boolean `consistent`.
   */
  def compare(source: DataFrame, target: DataFrame,
              orderCol: Column, rowHash: Column): DataFrame = {
    val a = orderedChecksum(source, orderCol, rowHash)
      .withColumnRenamed("checksum", "source_checksum")
    val b = orderedChecksum(target, orderCol, rowHash)
      .withColumnRenamed("checksum", "target_checksum")
    a.crossJoin(b).withColumn("consistent",
      col("source_checksum") === col("target_checksum"))
  }
}
