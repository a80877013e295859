package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.JdbcApplySink

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
