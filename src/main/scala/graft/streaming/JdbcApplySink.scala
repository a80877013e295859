package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.sources.JdbcBootstrap

/**
 * The axon apply worker as a foreachBatch sink (reference: axon.go:143-173
 * event loop + axon_sql.go statement builders + axon_schema.go sequence
 * sync): per micro-batch, turn the changeset slice into the SQL statement
 * stream a target database must execute, in changeset order, plus the
 * end-of-batch sequence synchronization.
 *
 * The executor is pluggable (`exec`): a java.sql implementation binds the
 * named parameters from each changeset's JSON payload; tests use a
 * collecting executor. Statements per batch are generated FROM the batch
 * only (bounded), ordered by changeset id — the reference's serial
 * semantics — while the heavy reduction work (which key survives, final
 * payloads) is better done with [[graft.operators.Materializer]]; this
 * sink is the literal-apply path for targets that must see every event
 * (e.g. audit mirrors).
 *
 * Sequence sync (K8/K9): the reference issues one `setval` per applied
 * row (axon_schema.go:137-163); here one `setval` per (sequence, batch)
 * with the batch max — same end state, O(1) round-trips per batch.
 */
object JdbcApplySink {

  /** One statement to execute: SQL with :name params + the payload JSON
    * the binder should draw values from. */
  case class Statement(sql: String, payloadJson: String)

  /** Driver-side admission bound for one exec() call: above this many
    * changesets the batch is applied in id-ordered CHUNKS instead of one
    * collected statement list, so a cold-start backlog (first run against
    * a large audit table) cannot materialize the whole table driver-side.
    * The value is the same order as [[graft.sources.v2.CdcTailSource]]'s
    * `maxIdsPerTrigger` admission control — steady-state CDC batches sit
    * far below it, so the chunked path only engages on backlogs. */
  val DefaultMaxRowsPerBatch: Int = 100000

  /**
   * Generate the ordered statement stream for one micro-batch.
   *
   * Collects the batch driver-side (the literal-apply contract: the
   * reference executes its statement stream serially from one process),
   * bounded by the CALLER — [[writer]] routes anything larger than
   * `maxRowsPerBatch` through [[applyChunked]] instead of this.
   *
   * @param pks        PK columns per (schema, table)
   * @param seqCols    sequence-backed columns per (schema, table):
   *                   (column, sequenceName)
   */
  def statementsFor(batch: DataFrame,
                    pks: Map[(String, String), Seq[String]],
                    seqCols: Map[(String, String), Seq[(String, String)]] = Map.empty)
      : Seq[Statement] = {
    val rows = batch
      .select(col("id"), col("action"), col("schema_name"), col("table_name"),
        col("new_values"), col("old_values"))
      .orderBy(col("id"))
      .collect()
    val stmts = Seq.newBuilder[Statement]
    val seqMax = scala.collection.mutable.Map.empty[String, Long]
    rows.foreach(r => statementFor(r, pks, seqCols, stmts, seqMax))
    stmts ++= setvalStatements(seqMax)
    stmts.result()
  }

  /** The per-changeset statement (mutating `stmts` and the sequence
    * high-water marks) — shared by the collected and chunked paths. */
  private def statementFor(r: Row,
                           pks: Map[(String, String), Seq[String]],
                           seqCols: Map[(String, String), Seq[(String, String)]],
                           stmts: scala.collection.mutable.Builder[Statement, Seq[Statement]],
                           seqMax: scala.collection.mutable.Map[String, Long]): Unit =
    statementForFields(r.getString(1), r.getString(2), r.getString(3),
      r.getString(4), r.getString(5), pks, seqCols, stmts, seqMax)

  /** [[statementFor]] over plain fields — the executor-side
    * ([[applyPartitioned]]) form, which carries tuples instead of
    * Rows. */
  private def statementForFields(action: String, schema: String,
                                 table: String, nv: String, ov: String,
                                 pks: Map[(String, String), Seq[String]],
                                 seqCols: Map[(String, String), Seq[(String, String)]],
                                 stmts: scala.collection.mutable.Builder[Statement, Seq[Statement]],
                                 seqMax: scala.collection.mutable.Map[String, Long]): Unit = {
    val pk = pks.getOrElse((schema, table), Seq("id"))
    action match {
      case "INSERT" =>
        // one parse serves the column list AND every sequence probe
        val node = if (nv == null) null else mapper.readTree(nv)
        stmts += Statement(
          JdbcBootstrap.insertSql(schema, table,
            if (node == null) Nil else nodeKeys(node)), nv)
        // track sequence high-water marks from the payload
        seqCols.getOrElse((schema, table), Nil).foreach { case (c, seq) =>
          (if (node == null) None else nodeLong(node, c)).foreach { v =>
            seqMax.updateWith(seq)(m => Some(math.max(m.getOrElse(0L), v)))
          }
        }
      case "UPDATE" =>
        stmts += Statement(
          JdbcBootstrap.upsertSql(schema, table, jsonKeys(nv), pk), nv)
      case "DELETE" =>
        stmts += Statement(JdbcBootstrap.deleteSql(schema, table, pk), ov)
      case _ => ()
    }
  }

  /** End-of-batch sequence sync (one setval per sequence, batch max). */
  private def setvalStatements(
      seqMax: scala.collection.mutable.Map[String, Long]): Seq[Statement] =
    seqMax.toSeq.sortBy(_._1).map { case (seq, mx) =>
      Statement(JdbcBootstrap.syncSequenceSql(seq, mx), null)
    }

  /**
   * Apply one micro-batch in id-ordered chunks of at most
   * `maxRowsPerBatch` statements per exec() call, holding at most one
   * shuffle partition of the sorted batch driver-side at a time
   * (`toLocalIterator` over the range-partitioned sort — the sorted
   * partitions arrive in id order, so global order is preserved across
   * chunk boundaries).
   *
   * Serial-order argument: chunks are consecutive id ranges of the
   * id-sorted stream, handed to `exec` in order, each internally
   * ordered — the concatenation is exactly the unchunked statement
   * stream. Sequence setvals are NOT emitted per chunk (a later chunk's
   * max can be lower than an earlier one's, and a per-chunk setval would
   * regress the sequence); the high-water marks accumulate across all
   * chunks and one setval per sequence is executed after the last chunk
   * — the same end state as the unchunked form. Returns the applied
   * changeset count.
   *
   * COMMIT-BOUNDARY CONTRACT: each exec() call is a potential commit
   * boundary, so on this path a crash can land BETWEEN chunks and the
   * replayed micro-batch re-executes already-committed statements. The
   * generated statement stream is replay-idempotent by construction —
   * INSERTs carry ON CONFLICT DO NOTHING (the reference's K3 dup-skip),
   * UPSERTs and DELETEs are absolute, and setval sets an absolute value
   * — so the re-execution converges to the same end state. A CUSTOM
   * exec that batches side effects must preserve that idempotence (or
   * wrap all chunks in one transaction itself); an exec that relied on
   * one-call-per-batch atomicity should use [[statementsFor]] directly.
   */
  def applyChunked(batch: DataFrame,
                   pks: Map[(String, String), Seq[String]],
                   seqCols: Map[(String, String), Seq[(String, String)]],
                   exec: Seq[Statement] => Unit,
                   maxRowsPerBatch: Int = DefaultMaxRowsPerBatch): Long = {
    require(maxRowsPerBatch > 0,
      s"maxRowsPerBatch must be positive: $maxRowsPerBatch")
    val it = batch
      .select(col("id"), col("action"), col("schema_name"), col("table_name"),
        col("new_values"), col("old_values"))
      .orderBy(col("id"))
      .toLocalIterator()
    val seqMax = scala.collection.mutable.Map.empty[String, Long]
    var applied = 0L
    while (it.hasNext) {
      val stmts = Seq.newBuilder[Statement]
      var n = 0
      while (it.hasNext && n < maxRowsPerBatch) {
        statementFor(it.next(), pks, seqCols, stmts, seqMax)
        n += 1
      }
      applied += n
      exec(stmts.result())
    }
    val sync = setvalStatements(seqMax)
    if (sync.nonEmpty) exec(sync)
    applied
  }

  /** The partition key of one changeset for [[applyPartitioned]]:
    * schema, table, and the row's PK VALUES (from the new payload for
    * INSERT/UPDATE, the old one for DELETE — where the reference's
    * statements bind them) — so every statement touching one ROW lands
    * in one partition and keeps its id order. */
  private[streaming] def rowKey(action: String, schema: String,
                                table: String, nv: String, ov: String,
                                pks: Map[(String, String), Seq[String]]): String = {
    val pk = pks.getOrElse((schema, table), Seq("id"))
    val payload = if (action == "DELETE") ov else nv
    val node = if (payload == null) null else mapper.readTree(payload)
    val vals = pk.map { c =>
      val v = if (node == null) null else node.get(c)
      // canonical TEXT, not the JSON rendering: the same logical PK
      // value serialized as 5, 5.0, 1e1-style, or the stringified "5" /
      // "5.0" (audit payloads commonly stringify) must key identically,
      // or one row's INSERT and DELETE land in different partitions and
      // lose their relative order. Anything that READS as a number
      // canonicalizes through BigDecimal; over-canonicalizing is safe —
      // a key COLLISION merely co-locates two rows, only a SPLIT of one
      // row's statements is a hazard.
      if (v == null || v.isNull) "null"
      else {
        val t = v.asText()
        try {
          val d = new java.math.BigDecimal(t).stripTrailingZeros
          // toPlainString materializes every digit — a degenerate
          // exponent ("1e999999999") would allocate gigabytes on a
          // poison record. Real PKs fit far inside these bounds; past
          // them, canonicalize through BigDecimal's SCIENTIFIC
          // rendering (cheap — no digit materialization) rather than
          // the raw text: a bare degenerate float parses to a node
          // whose text is already "1E+999999999" while its stringified
          // twin keeps "1e999999999", and raw-text fallback would key
          // those apart (found by RowKeyProperties).
          if (d.precision > 64 || math.abs(d.scale) > 64) d.toString
          else d.toPlainString
        } catch { case _: NumberFormatException => t }
      }
    }
    s"$schema|$table|${vals.mkString("|")}"
  }

  /**
   * EXECUTOR-PARALLEL apply — the opt-in throughput mode for targets
   * that do not need cross-table ordering. The serial paths
   * ([[statementsFor]] / [[applyChunked]]) are faithful to the
   * reference's one-process apply loop but ceiling at one driver
   * thread; the only ordering the reference semantics actually REQUIRE
   * is per-key statement order (the same argument that justifies
   * [[graft.operators.Materializer]]'s per-key reduction). So: the
   * batch repartitions by (schema, table, PK values) — every statement
   * for one row lands in one partition — each partition sorts by
   * changeset id and applies through its OWN executor-side executor
   * from `execFactory` (e.g. one JDBC connection per partition, built
   * on the executor because connections don't serialize).
   *
   * CAVEATS (why serial stays the default): cross-KEY and cross-TABLE
   * statement order is not preserved, so targets with enforced foreign
   * keys, triggers reading other rows, or audit mirrors that must see
   * the exact global stream belong on the serial path. PK-CHANGING
   * UPDATEs belong there too: [[rowKey]] keys an UPDATE by the NEW
   * payload's PK values, so an UPDATE that moves a row to a new PK is
   * ordered independently of earlier statements that touched the same
   * physical row under its OLD key — a same-row (not just cross-key)
   * reordering. Streams whose UPDATEs never rewrite PKs (the common
   * CDC shape) are unaffected. Sequence sync
   * stays global and last: per-partition high-water marks reduce
   * driver-side to ONE setval per sequence at the batch max, through
   * `seqExec` (a per-partition setval could regress the sequence —
   * the applyChunked argument, across partitions instead of chunks).
   * Replay idempotence is the statement stream's own (INSERTs dup-skip,
   * UPSERTs/DELETEs absolute, setval absolute), per key.
   *
   * Returns the applied changeset count.
   */
  def applyPartitioned(batch: DataFrame,
                       pks: Map[(String, String), Seq[String]],
                       seqCols: Map[(String, String), Seq[(String, String)]],
                       execFactory: () => Seq[Statement] => Unit,
                       seqExec: Seq[Statement] => Unit,
                       numPartitions: Int = 8): Long = {
    require(numPartitions > 0, s"numPartitions must be positive: $numPartitions")
    val spark = batch.sparkSession
    import spark.implicits._
    val keyed = batch
      .select(col("id"), col("action"), col("schema_name"),
        col("table_name"), col("new_values"), col("old_values"))
      .as[(Long, String, String, String, String, String)]
      .map { case (id, a, sc, t, nv, ov) =>
        (rowKey(a, sc, t, nv, ov, pks), id, a, sc, t, nv, ov)
      }
      .repartition(numPartitions, col("_1"))
      .sortWithinPartitions(col("_2"))
    val results = keyed.mapPartitions { it =>
      val exec = execFactory()
      val stmts = Seq.newBuilder[Statement]
      val seqMax = scala.collection.mutable.Map.empty[String, Long]
      var n = 0L
      it.foreach { case (_, _, a, sc, t, nv, ov) =>
        statementForFields(a, sc, t, nv, ov, pks, seqCols, stmts, seqMax)
        n += 1
      }
      val s = stmts.result()
      if (s.nonEmpty) exec(s)
      Iterator.single((n, seqMax.toMap))
    }.collect()
    val merged = scala.collection.mutable.Map.empty[String, Long]
    results.foreach(_._2.foreach { case (k, v) =>
      merged.updateWith(k)(m => Some(math.max(m.getOrElse(0L), v)))
    })
    val sync = setvalStatements(merged)
    if (sync.nonEmpty) seqExec(sync)
    results.map(_._1).sum
  }

  /** foreachBatch sink: generate + hand every batch's statements to `exec`
    * in order. Batches up to `maxRowsPerBatch` go through the collected
    * single-call path ([[statementsFor]]); larger ones — a cold-start
    * backlog — through [[applyChunked]], so the driver never materializes
    * more than the bound at once. The batch is checkpointed once: the
    * size gate and the apply must see ONE evaluation (a nondeterministic
    * upstream could otherwise count under the bound and then collect
    * over it), and the gate's bounded count then reads cached blocks
    * instead of re-running the source. */
  def writer(pks: Map[(String, String), Seq[String]],
             seqCols: Map[(String, String), Seq[(String, String)]],
             exec: Seq[Statement] => Unit,
             maxRowsPerBatch: Int = DefaultMaxRowsPerBatch): (DataFrame, Long) => Unit =
    (batch, _) => {
      val b = batch.localCheckpoint(false)
      if (b.limit(maxRowsPerBatch + 1).count() <= maxRowsPerBatch)
        exec(statementsFor(b, pks, seqCols))
      else {
        applyChunked(b, pks, seqCols, exec, maxRowsPerBatch)
        ()
      }
    }

  // -- JSON helpers over flat row_to_json objects (Jackson — a regex
  // would misread escaped quotes inside string values) -------------------

  // floats parse as exact BigDecimals, not doubles: [[rowKey]]
  // canonicalizes PK values through the node's TEXT, and the default
  // double-backed parse corrupts the text first — "9223372036854775807e0"
  // would round to ...776000 and key apart from its bare-integer
  // rendering (found by RowKeyProperties). Statements bind the raw JSON
  // payload and [[nodeLong]] uses canConvertToLong, so nothing else
  // observes the node type.
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    .configure(com.fasterxml.jackson.databind.DeserializationFeature
      .USE_BIG_DECIMAL_FOR_FLOATS, true)

  private def nodeKeys(
      node: com.fasterxml.jackson.databind.JsonNode): Seq[String] = {
    val it = node.fieldNames()
    val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def nodeLong(node: com.fasterxml.jackson.databind.JsonNode,
                       field: String): Option[Long] =
    Option(node.get(field)).filter(_.canConvertToLong).map(_.asLong())

  private[streaming] def jsonKeys(json: String): Seq[String] =
    if (json == null) Nil else nodeKeys(mapper.readTree(json))

  private[streaming] def jsonLong(json: String, field: String): Option[Long] =
    if (json == null) None else nodeLong(mapper.readTree(json), field)
}
