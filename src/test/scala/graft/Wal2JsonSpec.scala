package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Wal2Json

class Wal2JsonSpec extends AnyFunSuite {
  import SparkTestSession._

  // the exact wire sample from the reference docs (db/wal2json.go shape)
  private val updateMsg =
    """{"change":[{"kind":"update","schema":"public","table":"users",
      |"columnnames":["id","first_name","last_name","email"],
      |"columntypes":["integer","text","text","text"],
      |"columnvalues":["2","Leia","Solo","leia@test.com"],
      |"oldkeys":{"keynames":["id"],"keytypes":["integer"],"keyvalues":["2"]}}],
      |"nextlsn":"0/16B5A60"}""".stripMargin.replace("\n", "")

  private val insertMsg =
    """{"change":[{"kind":"insert","schema":"public","table":"pets",
      |"columnnames":["id","name"],"columntypes":["integer","text"],
      |"columnvalues":["7","Rex"]}],"nextlsn":"0/16B5B00"}"""
      .stripMargin.replace("\n", "")

  test("wal2json messages decode to the changeset shape") {
    import spark.implicits._
    val raw = Seq((1L, updateMsg), (2L, insertMsg)).toDF("seq", "msg")
    val cs = Wal2Json.decode(raw, "seq", "msg").orderBy("id").collect()
    assert(cs.length == 2)
    val upd = cs(0)
    assert(upd.getAs[String]("action") == "UPDATE")
    assert(upd.getAs[String]("schema_name") == "public")
    assert(upd.getAs[String]("table_name") == "users")
    assert(upd.getAs[String]("new_values").contains("\"first_name\":\"Leia\""))
    // integer-typed values are re-encoded UNQUOTED — audit-mode
    // row_to_json parity (changeset.go:57-61)
    assert(upd.getAs[String]("old_values").contains("\"id\":2"))
    assert(upd.getAs[String]("new_values").contains("\"id\":2"))
    assert(upd.getAs[String]("lsn") == "0/16B5A60")
    val ins = cs(1)
    assert(ins.getAs[String]("action") == "INSERT")
    assert(ins.getAs[String]("old_values") == null)
    assert(ins.getAs[String]("new_values").contains("\"name\":\"Rex\""))
  }

  test("typed view preserves column order, types, and value JSON") {
    import spark.implicits._
    // numeric/bool/json values unquoted + nested json carried verbatim
    val msg =
      """{"change":[{"kind":"insert","schema":"public","table":"t",
        |"columnnames":["id","price","ok","meta","note","jstr","jnum"],
        |"columntypes":["bigint","numeric(10,2)","boolean","jsonb","text","jsonb","json"],
        |"columnvalues":[9,12.5,true,{"tags":["a,b","c}"]},"he said \"hi\"","plain text",7]}],
        |"nextlsn":"1/A0"}""".stripMargin.replace("\n", "")
    val out = Wal2Json.decodeTyped(Seq((3L, msg)).toDF("seq", "msg"),
      "seq", "msg").collect().head

    // order-preserving array<struct<column,value,type>> (changeset.go:77-81)
    val cols = out.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("new_cols").toSeq
    assert(cols.map(_.getString(0)) ==
      Seq("id", "price", "ok", "meta", "note", "jstr", "jnum"))
    assert(cols.map(_.getString(2)) ==
      Seq("bigint", "numeric(10,2)", "boolean", "jsonb", "text", "jsonb", "json"))
    assert(cols(3).getString(1) == """{"tags":["a,b","c}"]}""")

    // payload JSON is typed: numbers/bools/json raw, strings escaped
    val nv = out.getAs[String]("new_values")
    assert(nv.contains("\"id\":9"))
    assert(nv.contains("\"price\":12.5"))
    assert(nv.contains("\"ok\":true"))
    assert(nv.contains("\"meta\":{\"tags\":[\"a,b\",\"c}\"]}"))
    assert(nv.contains("\"note\":\"he said \\\"hi\\\"\""))
    // a jsonb SCALAR string must be re-escaped (raw would be invalid JSON);
    // a json scalar number stays raw
    assert(nv.contains("\"jstr\":\"plain text\""))
    assert(nv.contains("\"jnum\":7"))
    // the full payload stays parseable JSON
    assert(graft.model.Changeset(1L, None, "INSERT", "public", "t", None,
      Some(nv), None).newValue("jstr").contains("plain text"))
    // the typed payload is parseable and round-trips through a typed
    // projection (PgTypes consumption)
    import org.apache.spark.sql.functions.{col, get_json_object}
    val typed = Wal2Json.decodeTyped(Seq((3L, msg)).toDF("seq", "msg"),
      "seq", "msg")
      .select(
        Wal2Json.typedColumn(col("new_cols"), "id", "bigint").as("id2"),
        Wal2Json.typedColumn(col("new_cols"), "price", "numeric(10,2)").as("p"),
        Wal2Json.typedColumn(col("new_cols"), "ok", "boolean").as("ok"))
      .collect().head
    assert(typed.getLong(0) == 9L)
    assert(typed.getDecimal(1) == new java.math.BigDecimal("12.50"))
    assert(typed.getBoolean(2))
    assert(get_json_object(org.apache.spark.sql.functions.lit(nv), "$.note") != null)
  }

  test("lsn resume ≡ id resume on a decoded stream (startFromLsn wiring)") {
    import spark.implicits._
    val raw = Seq((1L, updateMsg), (2L, insertMsg)).toDF("seq", "msg")
    val decoded = Wal2Json.decode(raw, "seq", "msg")
    // resume from message 1's nextlsn ≡ resume from message 2's first id
    val byLsn = Graft(spark).startFromLsn("0/16B5A60").replay(decoded)
      .select("id").collect().map(_.getLong(0)).toSeq
    val byId = Graft(spark).startFromId(2L << 20).replay(decoded)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(byLsn == byId && byLsn.nonEmpty)
    // and lsn ordering is numeric, not lexicographic: "0/16B5A60" < "1/A0"
    val cmp = spark.range(1).select(
      (Wal2Json.lsnToLong(org.apache.spark.sql.functions.lit("1/A0")) >
        Wal2Json.lsnToLong(org.apache.spark.sql.functions.lit("0/16B5A60")))
        .as("gt")).collect().head.getBoolean(0)
    assert(cmp)
    // malformed user tokens fail loudly at the facade, not in a column
    intercept[IllegalArgumentException] {
      Graft(spark).startFromLsn("16B5A60")
    }
    // full-32-bit hi must not overflow (decimal arithmetic)
    val big = spark.range(1).select(
      (Wal2Json.lsnToLong(org.apache.spark.sql.functions.lit("FFFFFFFF/FF")) >
        Wal2Json.lsnToLong(org.apache.spark.sql.functions.lit("7FFFFFFF/FF")))
        .as("gt")).collect().head.getBoolean(0)
    assert(big)
    // rows with NULL lsn are kept on an lsn resume (cannot be positioned —
    // at-least-once bias, never silent loss)
    import spark.implicits._
    val mixed = Wal2Json.decode(raw, "seq", "msg")
      .unionByName(Wal2Json.decode(raw, "seq", "msg")
        .limit(1).withColumn("lsn",
          org.apache.spark.sql.functions.lit(null).cast("string")))
    val kept = Graft(spark).startFromLsn("0/16B5A60").replay(mixed).count()
    assert(kept == byId.length + 1)
  }

  test("decoded stream flows through the standard pipeline stages") {
    import spark.implicits._
    val raw = Seq((1L, updateMsg), (2L, insertMsg)).toDF("seq", "msg")
    val filtered = graft.operators.TableFilters.whitelist(Seq("public.users"))(
      Wal2Json.decode(raw, "seq", "msg"))
    assert(filtered.count() == 1)
    assert(filtered.collect().head.getAs[String]("table_name") == "users")
  }
}
