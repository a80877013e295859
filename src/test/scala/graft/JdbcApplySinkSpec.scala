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
}
