package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.ChangesetSchema
import graft.operators.Materializer

class MaterializeAllSpec extends AnyFunSuite {
  import SparkTestSession._

  test("mixed multi-table changelog materializes every table") {
    val rows = Seq(
      // public.users: insert, update
      (1L, "INSERT", "public", "users", """{"id":1,"name":"Bob"}""", null),
      (2L, "UPDATE", "public", "users", """{"id":1,"name":"Bobby"}""", """{"id":1}"""),
      // public.pets: insert, delete
      (3L, "INSERT", "public", "pets", """{"id":5,"name":"Rex"}""", null),
      (4L, "DELETE", "public", "pets", null, """{"id":5}"""),
      // app.orders: two inserts
      (5L, "INSERT", "app", "orders", """{"id":9,"total":1.5}""", null),
      (6L, "INSERT", "app", "orders", """{"id":10,"total":2.5}""", null)
    ).map { case (id, a, sc, t, nv, ov) =>
      org.apache.spark.sql.Row(id, null, a, sc, t, 1L, nv, ov)
    }
    val changelog = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), ChangesetSchema.schema)

    def schema(fields: (String, DataType)*) =
      StructType(fields.map { case (n, t) => StructField(n, t) })
    val states = Materializer.materializeAll(changelog, Map(
      ("public", "users") -> Materializer.TableSpec("id",
        schema("id" -> LongType, "name" -> StringType)),
      ("public", "pets") -> Materializer.TableSpec("id",
        schema("id" -> LongType, "name" -> StringType)),
      ("app", "orders") -> Materializer.TableSpec("id",
        schema("id" -> LongType, "total" -> DoubleType))))

    val users = states(("public", "users")).collect()
    assert(users.length == 1 && users.head.getString(1) == "Bobby")
    assert(states(("public", "pets")).count() == 0)
    val orders = states(("app", "orders")).orderBy("id").collect()
    assert(orders.map(_.getLong(0)).toSeq == Seq(9L, 10L))
  }
}
