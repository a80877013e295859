package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
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
 * Two views:
 *  - [[decode]]: payloads re-encoded as JSON objects, TYPE-AWARE — numeric/
 *    boolean/json columns stay unquoted, so the result is byte-compatible
 *    with audit-mode `row_to_json` payloads (both capture modes produce
 *    type-identical streams, changeset.go:57-61).
 *  - [[decodeTyped]]: additionally carries the order-preserving,
 *    type-tagged `array<struct<column,value,type>>` view of each change
 *    (changeset.go:77-81 `ChangesetColumn` parity) plus the message `lsn`,
 *    feeding [[graft.model.PgTypes.toSpark]] for typed projections.
 *
 * Pure Column work: `from_json` → `posexplode` → per-entry encode →
 * `concat`; runs identically on batch frames and streaming micro-batches.
 * Note `from_json` with string-typed fields preserves raw JSON text for
 * nested objects/arrays and the literal form of scalars, so no value
 * information is lost before the type-aware re-encode.
 */
object Wal2Json {

  val messageSchema: StructType = StructType.fromDDL(
    "change array<struct<kind:string,schema:string,table:string," +
      "columnnames:array<string>,columntypes:array<string>," +
      "columnvalues:array<string>," +
      "oldkeys:struct<keynames:array<string>,keytypes:array<string>," +
      "keyvalues:array<string>>>>, nextlsn string")

  /** Escape a string column into a JSON string literal (quotes included). */
  def jsonStringLiteral(c: Column): Column = {
    val arr = to_json(array(c)) // ["escaped"] — reuse Spark's JSON writer
    arr.substr(lit(2), length(arr) - 2)
  }

  /** PG types whose JSON form is emitted raw (unquoted): numerics and
   *  booleans — their parsed text is always a valid JSON literal. */
  private def rawJsonType(t: Column): Column = {
    val lt = lower(t)
    lt.isin("smallint", "integer", "int", "int2", "int4", "bigint", "int8",
      "serial", "bigserial", "real", "float4", "double precision", "float8",
      "boolean", "bool") ||
      lt.startsWith("numeric") || lt.startsWith("decimal")
  }

  /** json/jsonb columns: the parsed value is the raw JSON text for
   *  objects/arrays (from_json preserves the subtree), but a SCALAR
   *  json value ("hello", 1.5, true) arrives unquoted-by-parsing, so
   *  emitting it raw would produce invalid JSON for strings. Re-emit
   *  raw only when the text is a self-evident JSON literal; re-escape
   *  as a string otherwise. (A jsonb string that LOOKS like a number —
   *  jsonb '"123"' — is indistinguishable on the wire after parsing and
   *  re-encodes as a number; the quoting was lost upstream.) */
  private def jsonTypeName(t: Column): Column = lower(t).isin("json", "jsonb")

  /** Is the value text itself a JSON literal? Object/array shapes are
   *  PARSE-verified (a jsonb scalar string like "{not json" must be
   *  re-escaped, not emitted raw); numbers/booleans/null match exactly.
   *  Leading whitespace allowed — `json` columns preserve source text. */
  private def jsonLiteralShaped(v: Column): Column = {
    val t = ltrim(v)
    (t.startsWith("{") &&
      from_json(v, MapType(StringType, StringType)).isNotNull) ||
      (t.startsWith("[") &&
        from_json(v, ArrayType(StringType)).isNotNull) ||
      t.rlike("^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$") ||
      t.isin("true", "false", "null")
  }

  /** Order-preserving type-tagged column view: (names, types, values) →
   *  array<struct<column,value,type>> (changeset.go:77-81). */
  private def colsView(names: Column, types: Column, values: Column): Column =
    zip_with(names, zip_with(types, values, (t, v) => struct(t.as("t"), v.as("v"))),
      (n, tv) => struct(n.as("column"), tv.getField("v").as("value"),
        tv.getField("t").as("type")))

  /** Re-encode a cols view as a row_to_json-compatible JSON object:
   *  `{"name":value,…}` with values unquoted for numeric/boolean/json
   *  types, JSON-escaped otherwise, and JSON null for null values. */
  private def payloadJson(cols: Column): Column =
    concat(lit("{"),
      concat_ws(",", transform(cols, e =>
        concat(jsonStringLiteral(e.getField("column")), lit(":"),
          when(e.getField("value").isNull, lit("null"))
            .when(rawJsonType(e.getField("type")), e.getField("value"))
            .when(jsonTypeName(e.getField("type")) &&
              jsonLiteralShaped(e.getField("value")), e.getField("value"))
            .otherwise(jsonStringLiteral(e.getField("value")))))),
      lit("}"))

  /** Composite id: one message can carry many changes. 2^20 changes per
   *  message keeps composite ids unique and ordered for message ids up to
   *  2^43 (a transaction touching >1M rows in one wal2json message would
   *  need chunked output upstream anyway). */
  private def compositeId(msgId: Column, chgIdx: Column): Column =
    shiftleft(msgId, 20) + chgIdx

  /**
   * Decode raw wal2json messages (`msgCol`, with monotonically increasing
   * message id `idCol` ≅ LSN order) into the changeset shape + `lsn`
   * (the message's nextlsn — the resume token for [[lsnToLong]] filters).
   */
  def decode(raw: DataFrame, idCol: String, msgCol: String): DataFrame =
    decodeTyped(raw, idCol, msgCol)
      .drop("new_cols", "old_cols")

  /**
   * Decode with the order-preserving typed column views retained:
   * changeset columns + `lsn` + `new_cols`/`old_cols` as
   * `array<struct<column,value,type>>`. Use [[typedColumn]] to project a
   * column at its declared PG type.
   */
  def decodeTyped(raw: DataFrame, idCol: String, msgCol: String): DataFrame = {
    val parsed = raw.select(col(idCol).cast("long").as("id"),
      from_json(col(msgCol), messageSchema).as("m"))
    parsed
      .select(col("id"), col("m.nextlsn").as("lsn"),
        posexplode(col("m.change")).as(Seq("chg_idx", "c")))
      .withColumn("new_cols",
        when(col("c.columnnames").isNotNull,
          colsView(col("c.columnnames"), col("c.columntypes"),
            col("c.columnvalues"))))
      .withColumn("old_cols",
        when(col("c.oldkeys.keynames").isNotNull,
          colsView(col("c.oldkeys.keynames"), col("c.oldkeys.keytypes"),
            col("c.oldkeys.keyvalues"))))
      .select(
        compositeId(col("id"), col("chg_idx")).as("id"),
        lit(null).cast("timestamp").as("ts"),
        upper(col("c.kind")).as("action"),
        col("c.schema").as("schema_name"),
        col("c.table").as("table_name"),
        lit(0L).as("relid"),
        when(col("new_cols").isNotNull, payloadJson(col("new_cols")))
          .as("new_values"),
        when(col("old_cols").isNotNull, payloadJson(col("old_cols")))
          .as("old_values"),
        col("lsn"), col("new_cols"), col("old_cols"))
  }

  /** A typed cols view as a name→value map — alias it once when
   *  projecting several columns (map_from_entries is non-cheap, so
   *  CollapseProject keeps the aliased map out of the projections). */
  def colsMap(colsCol: Column): Column =
    map_from_entries(transform(colsCol, e =>
      struct(e.getField("column"), e.getField("value"))))

  /** Project one column of a typed cols view at its declared PG type
   *  (feeds [[graft.model.PgTypes.toSpark]]). */
  def typedColumn(colsCol: Column, name: String, pgType: String): Column =
    element_at(colsMap(colsCol), name)
      .cast(graft.model.PgTypes.toSpark(pgType))

  /** Parse a Postgres LSN string `hi/lo` (hex) into an orderable number.
   *  Decimal(20,0) arithmetic: hi can be the full 32 bits, so hi·2^32+lo
   *  does not fit a signed long (ANSI would raise on overflow).
   *  try_element_at: a malformed/partial token yields null, not an ANSI
   *  array-index error killing the whole query. */
  def lsnToLong(lsn: Column): Column = {
    val parts = split(lsn, "/")
    // hex-validate each part before conv: Spark's conv follows MySQL
    // semantics and maps garbage to 0, which would make a corrupted token
    // order as the SMALLEST lsn (silently dropped by resume filters)
    // instead of null (kept)
    def hexPart(i: Int): Column = {
      val p = try_element_at(parts, lit(i))
      when(p.rlike("^[0-9a-fA-F]{1,8}$"), conv(p, 16, 10)).otherwise(lit(null))
    }
    (hexPart(1).cast("decimal(20,0)") * lit(4294967296L) +
      hexPart(2).cast("decimal(20,0)"))
  }

  private val LsnPattern = "^[0-9A-Fa-f]{1,8}/[0-9A-Fa-f]{1,8}$".r

  /** Validate a user-supplied LSN resume token eagerly (fail loudly in the
   *  driver, not silently in a column expression). */
  def requireValidLsn(lsn: String): String = {
    require(LsnPattern.matches(lsn),
      s"malformed LSN '$lsn' — expected hex hi/lo like 0/16B5A60")
    lsn
  }
}
