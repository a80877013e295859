package graft.model

import org.apache.spark.sql.types._

/**
 * Typed changeset row (reference: changeset.go:36-44). Payloads stay raw
 * JSON (see [[ChangesetSchema]]); by-name access mirrors
 * GetNewColumnValue / GetPreviousColumnValue (changeset.go:46-74).
 */
case class Changeset(
    id: Long,
    ts: Option[java.sql.Timestamp],
    action: String,
    schema_name: String,
    table_name: String,
    relid: Option[Long],
    new_values: Option[String],
    old_values: Option[String]) {

  // Real JSON parsing (Jackson, as in JdbcApplySink): a regex truncates
  // nested object/array values (json/jsonb columns) at the first ',' or
  // '}' and conflates the literal string "null" with JSON null.
  private def field(json: Option[String], name: String): Option[String] =
    json.flatMap { j =>
      try {
        Option(Changeset.mapper.readTree(j).get(name)).flatMap { node =>
          if (node.isNull) None // JSON null ≡ absent (changeset.go:46-54)
          else if (node.isTextual) Some(node.textValue()) // "null" stays "null"
          else Some(node.toString) // numbers/bools/objects/arrays: JSON text
        }
      } catch { case _: java.io.IOException => None }
    }

  /** GetNewColumnValue (changeset.go:46-54). */
  def newValue(column: String): Option[String] = field(new_values, column)

  /** GetPreviousColumnValue (changeset.go:66-74). */
  def oldValue(column: String): Option[String] = field(old_values, column)

  def kind: String = ChangesetSchema.normalizeKind(action)
}

object Changeset {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
}

/**
 * Core data model of the engine: the change-data-capture event ("changeset").
 *
 * Mirrors the reference semantics (reference: changeset.go:36-44 — one event
 * per changed row with kind/schema/table/timestamp and new/old values) but is
 * re-expressed for Spark: a changeset stream is a `DataFrame` with the columns
 * of [[ChangesetSchema.schema]], which matches the audit-table layout
 * (reference: db/sql.go:14-24) so that batch replay, streaming tail and sinks
 * all speak one shape.
 *
 * Values are carried as raw JSON strings (`new_values` / `old_values`),
 * decoded on demand with `from_json` / `get_json_object` — the reference makes
 * the same choice, keeping nested JSON un-decoded so checksums stay stable
 * (reference: notify_listener.go:192-198).
 */
object ChangesetSchema {
  val Insert = "INSERT"
  val Update = "UPDATE"
  val Delete = "DELETE"

  /** Audit-table-shaped changelog schema (reference: db/sql.go:14-24). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = true),
    StructField("action", StringType, nullable = false),
    StructField("schema_name", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("relid", LongType, nullable = true),
    StructField("new_values", StringType, nullable = true),
    StructField("old_values", StringType, nullable = true)
  ))

  /**
   * Case-insensitive kind normalization; unknown kinds map to empty string
   * (reference: changeset.go:21-33 — including the acknowledged TODO that
   * unknown kinds are silently mapped to "").
   */
  def normalizeKind(raw: String): String =
    if (raw == null) ""
    else raw.toUpperCase match {
      case k @ (Insert | Update | Delete) => k
      case _ => ""
    }
}

/**
 * Postgres-type-name → Spark DataType mapping (reference carries PG type-name
 * strings per column in LR mode, lr_listener.go:231-238; we map them to
 * Catalyst types when a typed projection of a table's change stream is
 * wanted).
 */
object PgTypes {
  private val exact: Map[String, DataType] = Map(
    "smallint" -> ShortType,
    "integer" -> IntegerType,
    "int" -> IntegerType,
    "int4" -> IntegerType,
    "bigint" -> LongType,
    "int8" -> LongType,
    "serial" -> IntegerType,
    "bigserial" -> LongType,
    "real" -> FloatType,
    "float4" -> FloatType,
    "double precision" -> DoubleType,
    "float8" -> DoubleType,
    "text" -> StringType,
    "json" -> StringType,
    "jsonb" -> StringType,
    "uuid" -> StringType,
    "bytea" -> BinaryType,
    "boolean" -> BooleanType,
    "bool" -> BooleanType,
    "date" -> DateType,
    "timestamp" -> TimestampType,
    "timestamp without time zone" -> TimestampNTZType,
    "timestamp with time zone" -> TimestampType,
    "timestamptz" -> TimestampType
  )

  /**
   * Resolve a PG type name (possibly parameterized like
   * `character varying(40)` or an array type `_text` / `text[]`) to a Spark
   * type. Unknown names fall back to StringType — the reference likewise
   * treats every value as its JSON form when in doubt.
   */
  def toSpark(pgType: String): DataType = {
    val t = pgType.trim.toLowerCase
    if (t.endsWith("[]")) ArrayType(toSpark(t.dropRight(2)))
    else if (t.startsWith("_")) ArrayType(toSpark(t.drop(1)))
    else if (t.startsWith("character varying") || t.startsWith("varchar") ||
             t.startsWith("character") || t.startsWith("char")) StringType
    else if (t.startsWith("numeric") || t.startsWith("decimal")) {
      // numeric(p,s) — parse precision/scale, default to a wide decimal
      val ps = "\\((\\d+)\\s*,\\s*(\\d+)\\)".r.findFirstMatchIn(t)
      ps.map(m => DecimalType(m.group(1).toInt, m.group(2).toInt))
        .getOrElse(DecimalType(38, 18))
    }
    else exact.getOrElse(t, StringType)
  }
}
