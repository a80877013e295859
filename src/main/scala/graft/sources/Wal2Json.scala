package graft.sources

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * wal2json wire-format decoder (reference: db/wal2json.go:4-26 — the
 * logical-replication message shape `{change: [{kind, schema, table,
 * columnnames[], columntypes[], columnvalues[], oldkeys{...}}], nextlsn}`),
 * i.e. the LR-mode ingestion path (lr_listener.go:214-255) re-expressed as
 * a declarative transformation: a DataFrame of raw wal2json message strings
 * becomes a changeset-schema DataFrame.
 *
 * Values are re-encoded as a JSON object (name→value), matching the audit
 * shape ([[graft.model.ChangesetSchema.schema]]) so both capture modes
 * produce one stream shape — exactly the reference's design, where both
 * listeners emit the same Changeset struct.
 *
 * Pure Column work: `from_json` → `explode` → `map_from_arrays` →
 * `to_json`; runs identically on batch frames and streaming micro-batches.
 */
object Wal2Json {

  val messageSchema: StructType = StructType.fromDDL(
    "change array<struct<kind:string,schema:string,table:string," +
      "columnnames:array<string>,columntypes:array<string>," +
      "columnvalues:array<string>," +
      "oldkeys:struct<keynames:array<string>,keytypes:array<string>," +
      "keyvalues:array<string>>>>, nextlsn string")

  /**
   * Decode a DataFrame with a raw wal2json message column (`msgCol`) and a
   * monotonically increasing message id (`idCol` ≅ LSN order) into the
   * changeset shape.
   */
  def decode(raw: DataFrame, idCol: String, msgCol: String): DataFrame = {
    val parsed = raw.select(col(idCol).cast("long").as("id"),
      from_json(col(msgCol), messageSchema).as("m"))
    parsed
      .select(col("id"), col("m.nextlsn").as("lsn"),
        posexplode(col("m.change")).as(Seq("chg_idx", "c")))
      .select(
        // sub-ordering: one message can carry many changes. 2^20 changes
        // per message keeps composite ids unique and ordered for message
        // ids up to 2^43 (a transaction touching >1M rows in one wal2json
        // message would need chunked output upstream anyway).
        (shiftleft(col("id"), 20) + col("chg_idx")).as("id"),
        lit(null).cast("timestamp").as("ts"),
        upper(col("c.kind")).as("action"),
        col("c.schema").as("schema_name"),
        col("c.table").as("table_name"),
        lit(0L).as("relid"),
        when(col("c.columnnames").isNotNull,
          to_json(map_from_arrays(col("c.columnnames"), col("c.columnvalues"))))
          .as("new_values"),
        when(col("c.oldkeys.keynames").isNotNull,
          to_json(map_from_arrays(col("c.oldkeys.keynames"),
            col("c.oldkeys.keyvalues"))))
          .as("old_values"))
  }
}
