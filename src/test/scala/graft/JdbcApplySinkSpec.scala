package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.JdbcApplySink

/** JVM-static collector for [[JdbcApplySink.applyPartitioned]]'s
  * executor-side exec calls (task closures are serialized even in local
  * mode, so a captured instance would be a per-task copy). */
object PartCollector {
  val q = new java.util.concurrent.ConcurrentLinkedQueue[
    Seq[JdbcApplySink.Statement]]()
}

class JdbcApplySinkSpec extends AnyFunSuite {
  import SparkTestSession._

  private def cs(rows: (Long, String, String, String)*) = {
    // (id, action, new_values, old_values) on public.users
    val data = rows.map { case (id, a, nv, ov) =>
      org.apache.spark.sql.Row(id, null, a, "public", "users", 1L, nv, ov)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data),
      graft.model.ChangesetSchema.schema)
  }

  test("apply sink emits ordered insert/upsert/delete + batched setval") {
    val batch = cs(
      (3L, "DELETE", null, """{"id":9}"""),
      (1L, "INSERT", """{"id":7,"name":"Bob"}""", null),
      (2L, "UPDATE", """{"id":7,"name":"Bo"}""", """{"id":7}"""),
      (4L, "INSERT", """{"id":11,"name":"Ann"}""", null))
    val stmts = JdbcApplySink.statementsFor(batch,
      pks = Map(("public", "users") -> Seq("id")),
      seqCols = Map(("public", "users") -> Seq(("id", "public.users_id_seq"))))
    // statements follow changeset id order regardless of input order
    assert(stmts.map(_.sql.split(" ").head).take(4).toSeq ==
      Seq("INSERT", "INSERT", "DELETE", "INSERT"))
    assert(stmts(0).sql ==
      """INSERT INTO "public"."users" ("id", "name") VALUES (:id, :name) ON CONFLICT DO NOTHING""")
    assert(stmts(1).sql.contains("""ON CONFLICT ("id") DO UPDATE SET "name" = :name"""))
    assert(stmts(2).sql == """DELETE FROM "public"."users" WHERE "id" = :id""")
    // one setval with the batch max (11), not one per row
    val setvals = stmts.filter(_.sql.startsWith("SELECT setval"))
    assert(setvals.map(_.sql) ==
      Seq("SELECT setval('public.users_id_seq', 11, true)"))
  }

  test("sink plugs into foreachBatch over a live stream") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[JdbcApplySink.Statement]
    val logDir = java.nio.file.Files.createTempDirectory("graft-apply").toString
    cs((1L, "INSERT", """{"id":1,"v":"a"}""", null),
       (2L, "DELETE", null, """{"id":1}"""))
      .write.mode("append").parquet(logDir)
    val q = graft.streaming.ChangesetStream.fromFiles(spark, logDir)
      .writeStream
      .foreachBatch(JdbcApplySink.writer(
        Map(("public", "users") -> Seq("id")), Map.empty,
        st => { seen.synchronized { seen ++= st }; () }))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(seen.map(_.sql.split(" ").head).toSeq == Seq("INSERT", "DELETE"))
  }

  test("oversized batch is split into ordered chunks, setval once at end") {
    import spark.implicits._
    // 1000 inserts with ids shuffled across partitions; sequence values
    // DESCEND with id so a per-chunk setval would regress the sequence —
    // the end state must be the global max (1000), set exactly once
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(
        scala.util.Random.shuffle((1L to 1000L).toList).map { id =>
          org.apache.spark.sql.Row(id, null, "INSERT", "public", "users", 1L,
            s"""{"id":${1001L - id},"name":"u$id"}""", null)
        }, 8),
      graft.model.ChangesetSchema.schema)
    val calls = scala.collection.mutable.ArrayBuffer.empty[Seq[JdbcApplySink.Statement]]
    val applied = JdbcApplySink.applyChunked(batch,
      pks = Map(("public", "users") -> Seq("id")),
      seqCols = Map(("public", "users") -> Seq(("id", "public.users_id_seq"))),
      exec = st => { calls += st; () },
      maxRowsPerBatch = 300)
    assert(applied == 1000L)
    // 4 data chunks of ≤300 + 1 final setval call
    val (dataCalls, syncCalls) = calls.toSeq.partition(
      c => !c.exists(_.sql.startsWith("SELECT setval")))
    assert(dataCalls.map(_.size) == Seq(300, 300, 300, 100),
      s"chunk sizes: ${dataCalls.map(_.size)}")
    assert(syncCalls.flatten.map(_.sql) ==
      Seq("SELECT setval('public.users_id_seq', 1000, true)"),
      "exactly one setval, at the GLOBAL max, after the last chunk")
    // global id order across chunk boundaries: payload names u1..u1000
    val ids = dataCalls.flatten.map(_.payloadJson).map(j =>
      j.substring(j.indexOf("u") + 1, j.indexOf("\"}", j.indexOf("u"))).toLong)
    assert(ids == (1L to 1000L), "statement stream must follow changeset id order")
    // and the chunked stream equals the unchunked one, statement for
    // statement (minus call boundaries)
    val unchunked = JdbcApplySink.statementsFor(batch,
      Map(("public", "users") -> Seq("id")),
      Map(("public", "users") -> Seq(("id", "public.users_id_seq"))))
    assert(calls.toSeq.flatten == unchunked)
  }

  // ---- executor-parallel apply (round 11) ------------------------------

  /** A tiny target-DB model with the statement stream's semantics:
    * INSERT = dup-skip, UPSERT = absolute set, DELETE = absolute remove,
    * setval = absolute sequence value. Key = (table, payload id). */
  private def applyModel(db: scala.collection.mutable.Map[String, String],
                         stmts: Seq[JdbcApplySink.Statement]): Unit =
    stmts.foreach { st =>
      if (st.sql.startsWith("SELECT setval")) {
        db(st.sql.split("'")(1)) = st.sql.split(", ")(1)
      } else {
        val table = st.sql.split("\"")(3)
        val id = com.fasterxml.jackson.databind.json.JsonMapper.builder()
          .build().readTree(st.payloadJson).get("id").asLong()
        val key = s"$table#$id"
        if (st.sql.startsWith("DELETE")) { db.remove(key); () }
        else if (st.sql.contains("DO UPDATE")) db(key) = st.payloadJson
        else if (!db.contains(key)) db(key) = st.payloadJson // dup-skip
      }
    }

  test("partitioned apply: per-key order kept, any partition order converges") {
    // 3 tables x 20 keys, each key living a full INSERT→UPDATE→DELETE→
    // INSERT→UPDATE life in global id order; sequence values descend
    // with id so only a global-max setval is correct
    val rows = for {
      t <- Seq("users", "orders", "events")
      k <- 1 to 20
      (step, i) <- Seq("INSERT", "UPDATE", "DELETE", "INSERT", "UPDATE").zipWithIndex
    } yield {
      val id = (Seq("users", "orders", "events").indexOf(t) * 20 + k) * 10L + i
      val nv = s"""{"id":$k,"step":$i,"sv":${100000L - id}}"""
      (id, step, t, if (step == "DELETE") null else nv,
        if (step == "DELETE") s"""{"id":$k}""" else null)
    }
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, a, t, nv, ov) =>
        org.apache.spark.sql.Row(id, null, a, "public", t, 1L, nv, ov)
      }, 7), graft.model.ChangesetSchema.schema)
    val pks = Seq("users", "orders", "events")
      .map(t => ("public", t) -> Seq("id")).toMap
    val seqCols = Map(("public", "users") -> Seq(("sv", "public.users_sv_seq")))
    // the exec factory's closure is task-serialized even in local mode,
    // so the collector must be JVM-static (resolved per executor JVM),
    // not a captured instance
    PartCollector.q.clear()
    val syncCalls = scala.collection.mutable.ArrayBuffer.empty[
      Seq[JdbcApplySink.Statement]]
    val applied = JdbcApplySink.applyPartitioned(batch, pks, seqCols,
      execFactory = () => st => { PartCollector.q.add(st); () },
      seqExec = st => { syncCalls += st; () },
      numPartitions = 5)
    assert(applied == rows.size.toLong)
    import scala.jdk.CollectionConverters._
    val parts = PartCollector.q.asScala.toSeq
    // every key's statements live in exactly ONE partition, in step order
    def keyOf(st: JdbcApplySink.Statement): (String, Long) = {
      val table = st.sql.split("\"")(3)
      val id = com.fasterxml.jackson.databind.json.JsonMapper.builder()
        .build().readTree(st.payloadJson).get("id").asLong()
      (table, id)
    }
    val byKey = parts.zipWithIndex.flatMap { case (stmts, pi) =>
      stmts.map(st => (keyOf(st), pi, st))
    }.groupBy(_._1)
    assert(byKey.size == 60)
    byKey.foreach { case (key, occ) =>
      assert(occ.map(_._2).distinct.size == 1,
        s"key $key split across partitions")
      val kinds = occ.map(_._3.sql.split(" ").head)
      assert(kinds == Seq("INSERT", "INSERT", "DELETE", "INSERT", "INSERT"),
        s"key $key out of order: $kinds")
    }
    // ONE setval, at the global max of the descending sequence values
    assert(syncCalls.flatten.map(_.sql) ==
      Seq(s"SELECT setval('public.users_sv_seq', ${100000L - 10L}, true)"))
    // end-state equivalence: serial stream ≡ partitions in ANY order
    val serial = JdbcApplySink.statementsFor(batch, pks, seqCols)
    val dbSerial = scala.collection.mutable.Map.empty[String, String]
    applyModel(dbSerial, serial)
    for (ordering <- Seq(parts, parts.reverse, scala.util.Random.shuffle(parts))) {
      val db = scala.collection.mutable.Map.empty[String, String]
      ordering.foreach(p => applyModel(db, p))
      syncCalls.foreach(s => applyModel(db, s))
      assert(db == dbSerial, "partitioned end state diverged from serial")
    }
    // replay idempotence: applying the whole thing twice changes nothing
    val dbTwice = scala.collection.mutable.Map.empty[String, String]
    for (_ <- 1 to 2) {
      parts.foreach(p => applyModel(dbTwice, p))
      syncCalls.foreach(s => applyModel(dbTwice, s))
    }
    assert(dbTwice == dbSerial, "replay must be idempotent")
  }

  test("mixed PK representations (5 vs \"5\") still key one row to one partition") {
    // common audit-trigger shape: new_values carries the PK as a JSON
    // number, old_values as a stringified value. The partition key must
    // canonicalize — on the raw JSON rendering ("5" vs "\"5\"") a row's
    // INSERT and DELETE land in different partitions and lose order.
    val rows = for {
      k <- 1 to 12
      (step, i) <- Seq("INSERT", "DELETE", "INSERT").zipWithIndex
    } yield (k * 10L + i, step,
      if (step == "DELETE") null else s"""{"id":$k,"v":$i}""",
      // half the keys stringify the PK, half render it as a float —
      // both must canonicalize to the integer rendering new_values uses
      if (step == "DELETE")
        (if (k % 2 == 0) s"""{"id":"$k"}""" else s"""{"id":$k.0}""")
      else null)
    val batch = cs(rows: _*)
    val pks = Map(("public", "users") -> Seq("id"))
    PartCollector.q.clear()
    val applied = JdbcApplySink.applyPartitioned(batch, pks, Map.empty,
      execFactory = () => st => { PartCollector.q.add(st); () },
      seqExec = _ => (), numPartitions = 7)
    assert(applied == rows.size.toLong)
    import scala.jdk.CollectionConverters._
    val parts = PartCollector.q.asScala.toSeq
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder()
      .build()
    val byKey = parts.zipWithIndex.flatMap { case (stmts, pi) =>
      stmts.map(st =>
        (mapper.readTree(st.payloadJson).get("id").asLong(), pi, st))
    }.groupBy(_._1)
    assert(byKey.size == 12)
    byKey.foreach { case (k, occ) =>
      assert(occ.map(_._2).distinct.size == 1,
        s"key $k split across partitions on payload representation")
      assert(occ.map(_._3.sql.split(" ").head) ==
        Seq("INSERT", "DELETE", "INSERT"), s"key $k out of order")
    }
  }

  test("writer routes small batches whole and oversized batches chunked") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[Int]
    val w = JdbcApplySink.writer(
      Map(("public", "users") -> Seq("id")), Map.empty,
      st => { calls += st.size; () }, maxRowsPerBatch = 3)
    w(cs((1L, "INSERT", """{"id":1}""", null),
         (2L, "INSERT", """{"id":2}""", null)), 0L)
    assert(calls.toSeq == Seq(2), "small batch: one collected call")
    calls.clear()
    w(cs((1L to 7L).map(i =>
      (i, "INSERT", s"""{"id":$i}""", null: String)): _*), 1L)
    assert(calls.toSeq == Seq(3, 3, 1), "backlog batch: bounded chunks")
  }
}
