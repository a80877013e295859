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

  /**
   * Generate the ordered statement stream for one micro-batch.
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

    rows.foreach { r =>
      val (schema, table) = (r.getString(2), r.getString(3))
      val pk = pks.getOrElse((schema, table), Seq("id"))
      r.getString(1) match {
        case "INSERT" =>
          val cols = jsonKeys(r.getString(4))
          stmts += Statement(
            JdbcBootstrap.insertSql(schema, table, cols), r.getString(4))
          // track sequence high-water marks from the payload
          seqCols.getOrElse((schema, table), Nil).foreach { case (c, seq) =>
            jsonLong(r.getString(4), c).foreach { v =>
              seqMax.updateWith(seq)(m => Some(math.max(m.getOrElse(0L), v)))
            }
          }
        case "UPDATE" =>
          val cols = jsonKeys(r.getString(4))
          stmts += Statement(
            JdbcBootstrap.upsertSql(schema, table, cols, pk), r.getString(4))
        case "DELETE" =>
          stmts += Statement(
            JdbcBootstrap.deleteSql(schema, table, pk), r.getString(5))
        case _ => ()
      }
    }
    // end-of-batch sequence sync (one setval per sequence, batch max)
    seqMax.toSeq.sortBy(_._1).foreach { case (seq, mx) =>
      stmts += Statement(JdbcBootstrap.syncSequenceSql(seq, mx), null)
    }
    stmts.result()
  }

  /** foreachBatch sink: generate + hand every batch's statements to `exec`
    * in order. */
  def writer(pks: Map[(String, String), Seq[String]],
             seqCols: Map[(String, String), Seq[(String, String)]],
             exec: Seq[Statement] => Unit): (DataFrame, Long) => Unit =
    (batch, _) => exec(statementsFor(batch, pks, seqCols))

  // -- JSON helpers over flat row_to_json objects (Jackson — a regex
  // would misread escaped quotes inside string values) -------------------

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private[streaming] def jsonKeys(json: String): Seq[String] =
    if (json == null) Nil
    else {
      val node = mapper.readTree(json)
      val it = node.fieldNames()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }

  private[streaming] def jsonLong(json: String, field: String): Option[Long] =
    if (json == null) None
    else Option(mapper.readTree(json).get(field))
      .filter(_.canConvertToLong).map(_.asLong())
}
