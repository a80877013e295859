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
    assert(upd.getAs[String]("old_values").contains("\"id\":\"2\""))
    val ins = cs(1)
    assert(ins.getAs[String]("action") == "INSERT")
    assert(ins.getAs[String]("old_values") == null)
    assert(ins.getAs[String]("new_values").contains("\"name\":\"Rex\""))
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
