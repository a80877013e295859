package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BucketedState, Salting}

class ScaleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted two-phase aggregation equals direct aggregation") {
    val ev = sources.Tables.load(spark, sfDir, "events")
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("mx"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val salted = Salting.saltedAgg(ev, Seq(col("event_type")), buckets = 8,
      partialAggs = Seq(count(lit(1)).as("pn"), max(col("value")).as("pmx")),
      finalAggs = Seq(sum(col("pn")).as("n"), max(col("pmx")).as("mx")))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("bucketed state join avoids a shuffle on the bucketed side") {
    val o = sources.Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    BucketedState.write(o, "graft_bucketed_orders", "o_orderkey", 8)
    val state = BucketedState.read(spark, "graft_bucketed_orders")
    val updates = o.limit(100).withColumn("o_totalprice",
      col("o_totalprice") + 1)
    // force a non-broadcast plan so bucketing is actually consulted
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = state.join(updates, Seq("o_orderkey"), "left")
      val plan = joined.queryExecution.executedPlan.toString
      assert(joined.count() == o.count())
      assert(plan.contains("Bucketed: true"),
        s"expected a bucketed scan in plan:\n$plan")
      // the bucketed state side must not re-shuffle: exactly one Exchange
      // (for the incoming updates side)
      val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
      assert(exchanges <= 1, s"unexpected shuffles in plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
