package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stages
import graft.sources.Changelog

class GraftFacadeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("facade wires whitelist → ignore → user stages with resume point") {
    val pipe = Graft(spark)
      .whitelistTables("public.click", "app.*", "view")
      .ignoreTables("app.error")
      .startFromId(500)
      .withStage(Stages.mapColumn("table_name", upper))
    val out = pipe.replay(Changelog.fromEvents(spark, sfDir))
    val rows = out.select("id", "schema_name", "table_name").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) >= 500))
    assert(rows.forall(r => r.getString(2) == r.getString(2).toUpperCase))
    assert(!rows.exists(r =>
      r.getString(1) == "app" && r.getString(2) == "ERROR"))
  }

  test("typed changes expose by-name payload access") {
    val pipe = Graft(spark).whitelistTables("signup")
    val typed = pipe.typedChanges(Changelog.fromEvents(spark, sfDir))
    val first = typed.orderBy("id").head()
    assert(first.kind == "INSERT")
    assert(first.newValue("user_id").exists(_.nonEmpty))
    assert(first.newValue("no_such_column").isEmpty)
    assert(first.oldValue("user_id").isEmpty) // INSERT has no old values
  }

  test("typed accessors parse real JSON, not a regex approximation") {
    import graft.model.Changeset
    val cs = Changeset(1L, None, "UPDATE", "public", "t", None,
      Some("""{"j":{"a":[1,2],"s":"x,y"},"arr":[1,{"b":2}],""" +
        """"s":"null","n":null,"esc":"q\"uote, brace}","num":1.5}"""),
      None)
    // nested json/jsonb values come back as their full JSON text —
    // the old regex truncated at the first ',' or '}'
    assert(cs.newValue("j").contains("""{"a":[1,2],"s":"x,y"}"""))
    assert(cs.newValue("arr").contains("""[1,{"b":2}]"""))
    // a literal string "null" is NOT JSON null
    assert(cs.newValue("s").contains("null"))
    assert(cs.newValue("n").isEmpty) // JSON null ≡ absent
    assert(cs.newValue("esc").contains("""q"uote, brace}"""))
    assert(cs.newValue("num").contains("1.5"))
    assert(Changeset(1L, None, "U", "p", "t", None,
      Some("not json"), None).newValue("x").isEmpty)
  }

  test("facade streams through the same transform") {
    val dir = java.nio.file.Files.createTempDirectory("graft-facade").toString
    Changelog.fromEvents(spark, sfDir).limit(100)
      .write.mode("append").parquet(dir)
    val pipe = Graft(spark).whitelistTables("public.*")
    val q = pipe.changes(dir).writeStream.format("memory")
      .queryName("facade_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("facade_out")
    assert(got.count() > 0)
    assert(got.select("schema_name").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("public"))
  }

  test("CLI flags override env config; unset flags keep env values") {
    // env-derived base (injected map, not real env)
    val envCfg = GraftConfig.fromEnv(Map(
      "GRAFT_MODE" -> "audit",
      "GRAFT_START_FROM_ID" -> "100",
      "GRAFT_WHITELIST_TABLES" -> "public.users",
      "GRAFT_LOG_LEVEL" -> "info"))
    val (cfg, pos) = Main.applyFlags(envCfg, Seq(
      "/tmp/changelog", "--once",
      "--start-from-id", "250",
      "--ignore-tables", "app.secrets,app.keys",
      "--log-level", "warn"))
    assert(pos == Seq("/tmp/changelog")) // --once is not a positional
    assert(cfg.startFromId.contains(250L), "flag wins over env")
    assert(cfg.ignoreTables == Seq("app.secrets", "app.keys"))
    assert(cfg.logLevel == "warn")
    assert(cfg.mode == "audit" && cfg.whitelistTables == Seq("public.users"),
      "unset flags keep env values")

    // --start-from-lsn selects LR mode and validates the token
    val (lr, _) = Main.applyFlags(envCfg, Seq("d", "--start-from-lsn", "0/1A2B3C4D"))
    assert(lr.mode == "lr" && lr.startFromLsn.isDefined)
    intercept[IllegalArgumentException] {
      Main.applyFlags(envCfg, Seq("d", "--mode", "bogus"))
    }
    intercept[RuntimeException] {
      Main.applyFlags(envCfg, Seq("d", "--no-such-flag", "x"))
    }
    // a flag in the value position = omitted value → loud failure, not a
    // silently empty whitelist with a stray positional
    intercept[RuntimeException] {
      Main.applyFlags(envCfg, Seq("d", "--whitelist-tables", "--log-level", "warn"))
    }
    intercept[IllegalArgumentException] {
      Main.applyFlags(envCfg, Seq("d", "--log-level", "bogus"))
    }
    // flag validation matches the env path's case handling
    assert(Main.applyFlags(envCfg, Seq("d", "--mode", "LR"))._1.mode == "lr")
  }
}
