package graft.sources

/**
 * Driver-side JDBC bootstrap utilities — the setup/teardown and catalog
 * surface of the reference re-expressed as plain SQL generators (reference:
 * db/sql.go + db/schema.go + axon_schema.go). These run OUTSIDE the data
 * plane (a driver-side java.sql connection), exactly like the reference
 * runs them from Go before streaming starts; no Spark job involved.
 *
 * No Postgres is available in this build environment, so these are pure
 * generators, unit-tested as strings; the statements themselves mirror the
 * reference's DDL/DML line-for-line in effect (not in text).
 */
object JdbcBootstrap {

  val AuditSchema = "warp_pipe"

  /** S7 — audit schema + changesets table DDL (db/sql.go:8-24). */
  def createAuditDdl: Seq[String] = Seq(
    s"CREATE SCHEMA IF NOT EXISTS $AuditSchema",
    s"""CREATE TABLE IF NOT EXISTS $AuditSchema.changesets (
       |  id BIGSERIAL PRIMARY KEY,
       |  ts TIMESTAMPTZ DEFAULT NOW() NOT NULL,
       |  action TEXT NOT NULL CHECK (action IN ('INSERT', 'UPDATE', 'DELETE')),
       |  schema_name TEXT NOT NULL,
       |  table_name TEXT NOT NULL,
       |  relid OID NOT NULL,
       |  new_values JSON,
       |  old_values JSON
       |)""".stripMargin,
    // the reference defines four index constants but only ever creates
    // three — schema_name's index is dead code (db/sql.go:36,
    // db/schema.go:138-151). We create all four; the divergence is
    // deliberate and documented.
    s"CREATE INDEX IF NOT EXISTS changesets_ts_idx ON $AuditSchema.changesets (ts)",
    s"CREATE INDEX IF NOT EXISTS changesets_action_idx ON $AuditSchema.changesets (action)",
    s"CREATE INDEX IF NOT EXISTS changesets_table_name_idx ON $AuditSchema.changesets (table_name)",
    s"CREATE INDEX IF NOT EXISTS changesets_schema_name_idx ON $AuditSchema.changesets (schema_name)"
  )

  /** S6 — row-capture trigger function + per-table trigger registration
    * (db/sql.go:42-128; db/schema.go:262-288). */
  def triggerFunctionDdl: String =
    s"""CREATE OR REPLACE FUNCTION $AuditSchema.on_modify() RETURNS TRIGGER AS $$$$
       |BEGIN
       |  CASE TG_OP
       |  WHEN 'INSERT' THEN
       |    INSERT INTO $AuditSchema.changesets (action, schema_name, table_name, relid, new_values)
       |    VALUES (TG_OP, TG_TABLE_SCHEMA, TG_TABLE_NAME, TG_RELID, row_to_json(NEW));
       |  WHEN 'UPDATE' THEN
       |    INSERT INTO $AuditSchema.changesets (action, schema_name, table_name, relid, new_values, old_values)
       |    VALUES (TG_OP, TG_TABLE_SCHEMA, TG_TABLE_NAME, TG_RELID, row_to_json(NEW), row_to_json(OLD));
       |  WHEN 'DELETE' THEN
       |    INSERT INTO $AuditSchema.changesets (action, schema_name, table_name, relid, old_values)
       |    VALUES (TG_OP, TG_TABLE_SCHEMA, TG_TABLE_NAME, TG_RELID, row_to_json(OLD));
       |  END CASE;
       |  PERFORM pg_notify('warp_pipe_new_changeset',
       |    (SELECT currval('$AuditSchema.changesets_id_seq')::TEXT || '_' || extract(epoch from now())::TEXT));
       |  RETURN NULL;
       |END;
       |$$$$ LANGUAGE plpgsql""".stripMargin

  def registerTriggerDdl(schema: String, table: String): String =
    s"""CREATE TRIGGER "${table}_changesets" AFTER INSERT OR UPDATE OR DELETE
       |ON "$schema"."$table" FOR EACH ROW EXECUTE PROCEDURE $AuditSchema.on_modify()""".stripMargin

  /** Teardown (db/schema.go:32-39). */
  def teardownDdl: String = s"DROP SCHEMA IF EXISTS $AuditSchema CASCADE"

  /** K7 — primary-key catalog query (axon_schema.go:62-87). */
  def primaryKeysSql: String =
    """SELECT kcu.table_schema, kcu.table_name, kcu.column_name, kcu.ordinal_position
      |FROM information_schema.table_constraints tco
      |JOIN information_schema.key_column_usage kcu
      |  ON kcu.constraint_name = tco.constraint_name
      | AND kcu.constraint_schema = tco.constraint_schema
      |WHERE tco.constraint_type = 'PRIMARY KEY'
      |ORDER BY kcu.table_schema, kcu.table_name, kcu.ordinal_position""".stripMargin

  /** K8 — SERIAL/sequence-backed column discovery (axon_schema.go:99-128). */
  def sequenceColumnsSql: String =
    """SELECT table_schema, table_name, column_name,
      |  pg_get_serial_sequence(table_schema || '.' || table_name, column_name) AS seq
      |FROM information_schema.columns
      |WHERE column_default LIKE 'nextval(%'""".stripMargin

  /** K8 — post-batch sequence sync. The reference calls setval once per
    * applied row (axon_schema.go:137-163); one setval per batch with the
    * batch max reaches the same end state in O(1) round-trips. */
  def syncSequenceSql(seq: String, maxValue: Long): String =
    s"SELECT setval('$seq', $maxValue, true)"

  /** K9 — orphan (table-less) sequence discovery + copy (axon_schema.go:169-221). */
  def orphanSequencesSql: String =
    """SELECT s.schemaname || '.' || s.sequencename AS seq, s.last_value
      |FROM pg_sequences s
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM information_schema.columns c
      |  WHERE c.column_default LIKE 'nextval(''' || s.sequencename || '%')""".stripMargin

  /** V6 — version gate: upsert needs PG >= 9.5 (axon_schema.go:22-50). */
  def versionSupported(serverVersion: String): Boolean = {
    val parts = serverVersion.trim.split("[^0-9]+").filter(_.nonEmpty)
    val major = parts.headOption.map(_.toInt).getOrElse(0)
    val minor = if (parts.length > 1) parts(1).toInt else 0
    major > 9 || (major == 9 && minor >= 5)
  }

  /** K3/K4/K5 — apply statements (axon_sql.go:59-122). */
  def insertSql(schema: String, table: String, cols: Seq[String]): String =
    s"""INSERT INTO "$schema"."$table" (${cols.map(q).mkString(", ")}) VALUES (${cols.map(":" + _).mkString(", ")}) ON CONFLICT DO NOTHING"""

  def upsertSql(schema: String, table: String, cols: Seq[String], pk: Seq[String]): String = {
    val sets = cols.filterNot(pk.contains).map(c => s"${q(c)} = :$c").mkString(", ")
    s"""INSERT INTO "$schema"."$table" (${cols.map(q).mkString(", ")}) VALUES (${cols.map(":" + _).mkString(", ")}) ON CONFLICT (${pk.map(q).mkString(", ")}) DO UPDATE SET $sets"""
  }

  def deleteSql(schema: String, table: String, pk: Seq[String]): String =
    s"""DELETE FROM "$schema"."$table" WHERE ${pk.map(c => s"${q(c)} = :$c").mkString(" AND ")}"""

  private def q(c: String) = s""""$c""""
}
