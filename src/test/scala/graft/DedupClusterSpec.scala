package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dedup

class DedupClusterSpec extends AnyFunSuite {
  import SparkTestSession._

  test("cascade clusters exact copies with their near-dup representatives") {
    import spark.implicits._
    val base = sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    // add exact copies of every 10th doc under shifted ids
    val copies = base.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
    val corpus = base.unionByName(copies)

    val clusters = Dedup.nearDupClusters(corpus, "doc_id", "text", 0.8)
    val m = clusters.as[(Long, Long)].collect().toMap

    // every doc got a cluster; cluster ids are cluster minima
    assert(m.size == corpus.count())
    assert(m.forall { case (doc, c) => c <= doc })

    // exact copies land in their original's cluster
    assert(m.filter(_._1 >= 100000L)
      .forall { case (copy, c) => c == m(copy - 100000L) })

    // known near-dup pairs (from the oracle-checked pair query) share a cluster
    val pairs = Dedup.minhashDedup(base, "doc_id", "text", 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => m(a) == m(b) })

    // dedup keep-rule sanity: keeping doc_id == cluster_id keeps exactly
    // one representative per cluster
    val kept = m.count { case (doc, c) => doc == c }
    assert(kept == m.values.toSet.size)
  }

  test("distributed label propagation: >3 iterations, O(1) persisted storage") {
    import spark.implicits._
    // path graph 0-1-2-…-8 (diameter 8 ⇒ min-label propagation needs ~8
    // rounds) plus a disjoint triangle; driverEdgeLimit=0 forces the
    // distributed path that the default driver union-find would bypass
    val edges = ((0L until 8L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L))).toDF("doc_a", "doc_b")
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val labels = Dedup.connectedComponents(edges, maxIterations = 20,
      driverEdgeLimit = 0L)
    val m = labels.as[(Long, Long)].collect().toMap
    assert((0L to 8L).forall(m(_) == 0L), "path component labels to its min")
    assert(Seq(100L, 101L, 102L).forall(m(_) == 100L))
    // loop hygiene: superseded iterates and the edge checkpoint are
    // unpersisted — storage does not grow with the iteration count
    // (final iterate + at most a couple of transient entries may remain)
    val persistedAfter = spark.sparkContext.getPersistentRDDs.size
    assert(persistedAfter - persistedBefore <= 2,
      s"persisted RDDs grew by ${persistedAfter - persistedBefore} — " +
        "iterates are leaking cache")
  }

  test("pointer doubling converges in O(log diameter), not O(diameter)") {
    import spark.implicits._
    // path graph 0-1-…-50 (diameter 50): plain min-label propagation
    // needs 50 rounds, so maxIterations=7 would return PARTIAL labels;
    // with one neighbor-min hop + one label←label-of-label shortcut per
    // round the reach is d_{k+1} = 2(d_k + 1) — 0,2,6,14,30,62 — so 5
    // propagation rounds + 1 no-change round suffice. Full convergence
    // under maxIterations=7 is therefore only reachable by the doubling
    // path.
    val edges = (0L until 50L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(edges, maxIterations = 7,
      driverEdgeLimit = 0L)
    val m = labels.as[(Long, Long)].collect().toMap
    assert(m.size == 51)
    assert((0L to 50L).forall(m(_) == 0L),
      "diameter-50 path fully labeled to its min within 7 doubling rounds")
  }
}
