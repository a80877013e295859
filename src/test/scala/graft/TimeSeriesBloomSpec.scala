package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bloom
import graft.operators.TimeSeries

/** Round-5 additions: gap-filled resample / rolling / pivot time-series
  * shapes and the distributed Bloom filter. */
class TimeSeriesBloomSpec extends AnyFunSuite {
  import SparkTestSession._

  test("resample emits gap buckets with NULL aggregates") {
    import spark.implicits._
    // buckets of 10: data at 0, 10, and 40 — 20 and 30 are gaps
    val df = Seq((3L, 1.0), (9L, 2.0), (12L, 4.0), (41L, 8.0))
      .toDF("ts_us", "v")
    val got = TimeSeries.resample(df, col("ts_us"), 10L,
      Seq(count(lit(1)).as("n"), sum(col("v")).as("s")))
      .orderBy("bucket_us").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 10L, 20L, 30L, 40L))
    assert(got.map(r => if (r.isNullAt(1)) -1L else r.getLong(1)).toSeq ==
      Seq(2L, 1L, -1L, -1L, 1L))
    assert(got(2).isNullAt(2) && got(3).isNullAt(2))
  }

  test("bucketUs floors negative timestamps (not truncate-toward-zero)") {
    import spark.implicits._
    val got = Seq(-1L, -10L, -11L, 0L, 9L).toDF("t")
      .select(TimeSeries.bucketUs(col("t"), 10L).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(-10L, -10L, -20L, 0L, 0L))
  }

  test("rollingStats: trailing frame, deterministic under ts ties") {
    import spark.implicits._
    // user 1: two rows tie on ts=5; the id tie-breaker fixes frame order
    val df = Seq((1L, 1L, 5L, 10.0), (2L, 1L, 5L, 20.0), (3L, 1L, 7L, 40.0),
      (4L, 2L, 1L, 100.0)).toDF("id", "user", "ts", "v")
    val got = TimeSeries.rollingStats(df, Seq(col("user")),
      Seq(col("ts"), col("id")), col("v"), 2)
      .orderBy("id")
      .select("roll_n", "roll_sum").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 10.0), (2L, 30.0), (2L, 60.0), (1L, 100.0)))
  }

  test("pivotCounts: absent cells are 0, out-of-domain values dropped") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "a"), (1L, "zzz"), (2L, "b"))
      .toDF("g", "kind")
    val got = TimeSeries.pivotCounts(df, col("g"), col("kind"), Seq("a", "b"))
      .orderBy("g").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // "zzz" is outside the domain → contributes nowhere; (2,"a") cell = 0
    assert(got == Seq((1L, 2L, 0L), (2L, 0L, 1L)))
  }

  private def idsDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("k")
  }

  test("bloom: zero false negatives, fp rate within sized bound") {
    val members = idsDf(0L until 500L)
    val (m, k) = Bloom.sizeFor(500, 0.01)
    assert(m % 64 == 0 && k >= 1)
    // sizeFor output must always be valid build() input: k clamps at 32
    assert(Bloom.sizeFor(10, 1e-12)._2 <= 32)
    val flagged = Bloom.flagMembers(
      idsDf(0L until 5000L), col("k"), members, col("k"), m, k)
    val byHit = flagged.groupBy(col("k") < 500, col("bloom_hit")).count()
      .collect().map(r => ((r.getBoolean(0), r.getBoolean(1)), r.getLong(2)))
      .toMap
    // every true member flagged (no (member, !hit) cell at all)
    assert(byHit.getOrElse((true, false), 0L) == 0L)
    assert(byHit((true, true)) == 500L)
    // non-members: fp rate ~1% sized; assert with slack
    val fp = byHit.getOrElse((false, true), 0L)
    assert(fp <= 4500 * 0.05, s"fp=$fp out of bound")
  }

  test("bloom: build/probe hashing agrees across key types (string cast)") {
    import spark.implicits._
    val members = Seq("17", "42").toDF("k")
    val probes = idsDf(Seq(17L, 42L, 99L))
    val got = Bloom.flagMembers(probes, col("k"), members, col("k"),
      mBits = 1024, k = 3)
      .orderBy("k").collect().map(_.getBoolean(1)).toSeq
    assert(got == Seq(true, true, false))
  }

  test("tfIdfTopTerms: rational idf scores, term-asc tie-break") {
    import spark.implicits._
    // "x" appears in every doc (df=3 → idf 1.0); "q"/"z" are unique (idf 2.0)
    val df = Seq((1L, "x x q"), (2L, "x z"), (3L, "x")).toDF("doc_id", "text")
    val got = graft.functions.TextFns.tfIdfTopTerms(df, "doc_id", "text", 2)
      .orderBy("doc_id", "term")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // N+1=4: idf(x)=4/4=1, idf(q)=idf(z)=4/2=2
    assert(got == Seq((1L, "q", 1L, 2.0), (1L, "x", 2L, 2.0),
      (2L, "x", 1L, 1.0), (2L, "z", 1L, 2.0), (3L, "x", 1L, 1.0)))
  }

  test("repeatedSpans finds aligned cross-doc spans, ignores unique text") {
    import spark.implicits._
    // 12-token shared span at offsets 0 (doc 1) and 4 (doc 2): residues
    // agree mod stride=4, so windows align; doc 3 is unique text
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, span + " tail1 tail2"),
      (2L, "p1 p2 p3 p4 " + span),
      (3L, (1 to 20).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val got = graft.functions.Dedup.repeatedSpans(df, "doc_id", "text", 8, 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // two aligned 8-token windows inside the span (offsets 0 and 4)
    assert(got.length == 2 && got.forall(_ == ((2L, 1L, 2L))))
  }

  // The hash-path scores are the SAME integer operands divided the same
  // way (|A∪B| = na + nb − c exactly, absent 2^-60 collisions), so the
  // doubles must be bit-identical, not merely close — compare raw bits.
  private def pairBits(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1),
      java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet

  test("ngramJaccardByHash is bit-identical to the exact-verify anchor") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val exact = pairBits(graft.functions.Dedup.ngramJaccard(
      docs, "doc_id", "text", 0.8))
    val byHash = pairBits(graft.functions.Dedup.ngramJaccardByHash(
      docs, "doc_id", "text", 0.8))
    assert(exact.nonEmpty, "testdata should contain near-dup pairs")
    assert(exact == byHash)
  }

  test("ngramContainmentByHash is bit-identical to the exact anchor") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // add a truncated prefix doc so containment has a subset-dup positive
    val prefixes = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 900000L).as("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 18), " ").as("text"))
    val corpus = docs.unionByName(prefixes)
    val exact = pairBits(graft.functions.Dedup.ngramContainment(
      corpus, "doc_id", "text", 0.9))
    val byHash = pairBits(graft.functions.Dedup.ngramContainmentByHash(
      corpus, "doc_id", "text", 0.9))
    assert(exact.nonEmpty, "augmented corpus should contain subset dups")
    assert(exact == byHash)
  }

  test("selectByBudget: greedy cutoff, tie-break, equals the global-window form") {
    import spark.implicits._
    // quality ties (0.5, 0.5) broken by id; budget cuts inside the ties
    val df = Seq((1L, 0.9, 4L), (2L, 0.5, 3L), (3L, 0.5, 3L), (4L, 0.1, 5L))
      .toDF("id", "q", "tok")
    val got = graft.functions.Sampling.selectByBudget(
      df, col("id"), col("q"), col("tok"), budget = 8L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    // 1 (cum 0) admitted, 2 (cum 4) admitted, 3 (cum 7) admitted since
    // 7 < 8, 4 (cum 10) rejected
    assert(got == Seq((1L, 0L), (2L, 4L), (3L, 7L)))
    // NULL scores are excluded explicitly, never silently half-joined
    val withNull = Seq((1L, Some(0.9), 4L), (2L, None, 3L))
      .toDF("id", "q", "tok")
    val gotN = graft.functions.Sampling.selectByBudget(
      withNull, col("id"), col("q"), col("tok"), budget = 100L)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(gotN == Seq(1L))
    // range-partitioned two-phase == naive global window on real data
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFns.qualityScore(col("text")).as("q"),
        size(split(col("text"), " ")).cast("long").as("tok"))
    val twoPhase = graft.functions.Sampling.selectByBudget(
      docs, col("doc_id"), col("q"), col("tok"), budget = 1500L)
      .select("doc_id", "__cum_before").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gw = org.apache.spark.sql.expressions.Window
      .orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("cb", coalesce(sum(col("tok")).over(gw), lit(0L)))
      .filter(col("cb") < 1500L)
      .select("doc_id", "cb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twoPhase.nonEmpty && twoPhase == naive)
  }

  test("selectByBudgetBy: independent per-group budgets, unbudgeted groups drop") {
    import spark.implicits._
    val df = Seq(
      ("en", 1L, 0.9, 4L), ("en", 2L, 0.5, 4L), // en budget 4: id 2's cum 4 ≮ 4
      ("de", 3L, 0.3, 2L), ("de", 4L, 0.8, 3L), // de budget 6: 4 then 3 admitted
      ("xx", 5L, 0.9, 1L)) // no budget row → dropped
      .toDF("lang", "id", "q", "tok")
    val budgets = Seq(("en", 4L), ("de", 6L)).toDF("lang", "budget")
    val got = graft.functions.Sampling.selectByBudgetBy(
      df, Seq("lang"), col("id"), col("q"), col("tok"), budgets)
      .select("id", "__cum_before").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (4L, 0L), (3L, 3L)))
  }

  test("selectByBudgetBy: NULL group key is a group like any other") {
    import spark.implicits._
    // NULL lang rows must survive when budgets carries a NULL-lang row
    // (the DuckDB PARTITION BY form keeps a NULL partition) — requires
    // null-safe group joins, since NULL = NULL is never true
    val df = Seq(
      (Some("en"), 1L, 0.9, 4L),
      (None, 2L, 0.9, 3L), (None, 3L, 0.5, 3L), // NULL budget 4: only id 2
      (None, 4L, 0.2, 3L))
      .toDF("lang", "id", "q", "tok")
    val budgets = Seq((Some("en"), 10L), (Option.empty[String], 4L))
      .toDF("lang", "budget")
    val got = graft.functions.Sampling.selectByBudgetBy(
      df, Seq("lang"), col("id"), col("q"), col("tok"), budgets)
      .select("id", "__cum_before").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (2L, 0L), (3L, 3L)))
  }

  test("streaming bloom decontamination drops blocklisted keys only") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-bloomstream").toString
    val block = Seq("the quick brown fox", "lazy dog").toDF("text")
    Seq((1L, "the quick brown fox"), // blocklisted
      (2L, "a clean document"), (3L, "lazy dog"), // blocklisted
      (4L, "another clean one")).toDF("doc_id", "text")
      .write.parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(s"$tmp/in")
    val q = graft.streaming.StreamOps.bloomDecontaminateTo(
      stream, block, s"$tmp/out", s"$tmp/ckpt", "text")
    q.awaitTermination()
    val admitted = spark.read.parquet(s"$tmp/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(2L, 4L))
  }

  test("bloom: empty blocklist flags nothing") {
    val empty = idsDf(Seq.empty[Long])
    val got = Bloom.flagMembers(idsDf(1L to 10L), col("k"), empty, col("k"),
      mBits = 64, k = 1)
    assert(got.filter(col("bloom_hit")).count() == 0L)
  }
}
