package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ErrorChannel, Pipeline, Stages}
import graft.streaming.ForeachSinks

class OperatorsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("error channel: bad rows route to the side output, stream continues") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"a":1}"""),
      (2L, """not json at all"""),
      (3L, null.asInstanceOf[String])
    ).toDF("id", "new_values")
    val staged = Pipeline(ErrorChannel.guardValidJson)(df)
    val (ok, bad) = ErrorChannel.split(staged)
    assert(ok.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val errs = bad.collect()
    assert(errs.length == 1 && errs.head.getAs[Long]("id") == 2L)
    assert(errs.head.getAs[String](ErrorChannel.ErrorCol)
      .contains("malformed"))
  }

  test("config parses WP-style env with precedence rules") {
    val cfg = GraftConfig.fromEnv(Map(
      "GRAFT_MODE" -> "LR",
      "GRAFT_START_FROM_ID" -> "42",
      "GRAFT_WHITELIST_TABLES" -> "public.users, app.*",
      "GRAFT_IGNORE_TABLES" -> "app.secrets",
      "GRAFT_LOG_LEVEL" -> "DEBUG"))
    assert(cfg.mode == "lr")
    assert(cfg.startFromId.contains(42L))
    assert(cfg.whitelistTables == Seq("public.users", "app.*"))
    assert(cfg.ignoreTables == Seq("app.secrets"))
    assert(cfg.logLevel == "debug")
    // defaults + junk tolerance
    val dflt = GraftConfig.fromEnv(Map("GRAFT_MODE" -> "bogus",
      "GRAFT_START_FROM_ID" -> "not-a-number", "GRAFT_LOG_LEVEL" -> "loud"))
    assert(dflt.mode == "audit" && dflt.startFromId.isEmpty
      && dflt.logLevel == "info")
  }

  test("table list resolution: include ∪ catalog − exclude; PK required") {
    val catalog = Seq(("public", "users"), ("public", "pets"), ("app", "x"))
    val pks = Set(("public", "users"), ("public", "pets"))
    assert(TableList.resolve(catalog, pks, Nil, Seq(("app", "x")))
      == Right(Seq(("public", "users"), ("public", "pets"))))
    assert(TableList.resolve(catalog, pks, Seq(("public", "users")), Nil)
      == Right(Seq(("public", "users"))))
    assert(TableList.resolve(catalog, pks, Nil, Nil).isLeft) // app.x lacks PK
  }

  test("foreach push sink delivers one JSON line per event") {
    val cs = sources.Changelog.fromEvents(spark, sfDir).limit(5)
    ForeachSinks.CollectingWriter.buffer.clear()
    // drive the writer directly over a batch (unit scope; streaming uses
    // .writeStream.foreach(writer))
    val w = ForeachSinks.CollectingWriter.writer
    w.open(0, 0)
    cs.collect().foreach(w.process)
    w.close(null)
    val lines = ForeachSinks.CollectingWriter.buffer.toArray(Array.empty[String])
    assert(lines.length == 5)
    assert(lines.forall(l => l.startsWith("{") && l.contains("\"action\":")))
  }
}
