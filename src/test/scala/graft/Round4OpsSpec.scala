package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Md5Prefix28, Sampling, Similarity, TextFns, TopKAgg}
import graft.sources.Tables

/** Round-4 operators: bounded top-k aggregate, batch kNN join,
  * containment dedup, benchmark decontamination, repetition stats,
  * train/val/test split. */
class Round4OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("TopKAgg: exact top-k under (score DESC, id ASC), layout-independent") {
    import spark.implicits._
    val rows = Seq(
      (1L, "g1", 0.5), (2L, "g1", 0.9), (3L, "g1", 0.9), (4L, "g1", 0.1),
      (5L, "g1", Double.NaN), // NaN has no place in the total order
      (6L, "g2", 0.3))
    def run(parts: Int) = rows.toDF("id", "g", "s").repartition(parts)
      .groupBy(col("g"))
      .agg(TopKAgg(col("s"), col("id"), 3).as("top"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e =>
          (e.getDouble(0), e.getLong(1))).toList).toMap
    val expect = Map(
      "g1" -> List((0.9, 2L), (0.9, 3L), (0.5, 1L)), // tie 0.9 → lower id first
      "g2" -> List((0.3, 6L)))
    assert(run(1) == expect)
    assert(run(7) == expect, "merge order must not change the result")
  }

  test("TopKAgg rejects wrong-typed inputs at analysis time") {
    import spark.implicits._
    val df = Seq((1, "g", 1.0f)).toDF("id", "g", "s") // float score, int id
    val ex = intercept[Exception] {
      df.groupBy(col("g")).agg(TopKAgg(col("s"), col("id"), 2)).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("topk_agg"), ex.getMessage)
  }

  test("knnJoin matches the window-ranked brute force") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val got = Similarity.knnJoin(emb, "vec_id", "embedding", probePct = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val probes = emb.filter(
      pmod(Md5Prefix28(col("vec_id").cast("string")), lit(100L)) < 2)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val expect = emb.crossJoin(probes)
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        Similarity.cosine(col("embedding"), col("pv")).as("cos"))
      .filter(!isnan(col("cos"))) // knnJoin's NaN-exclusion contract
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    assert(got.nonEmpty && got == expect)
  }

  test("containment catches an embedded prefix that Jaccard misses") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val prefix = (1 to 12).map(i => s"w$i").mkString(" ")
    val other = (100 to 130).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, long), (2L, prefix), (3L, other)).toDF("doc_id", "text")
    val cont = Dedup.ngramContainment(df, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toList == List((1L, 2L, 1.0)), s"got: ${cont.toList}")
    val jac = Dedup.ngramJaccard(df, "doc_id", "text", 0.8).count()
    assert(jac == 0, "prefix pair must be invisible to Jaccard at 0.8")
  }

  test("decontaminate flags train docs overlapping the benchmark sample") {
    import spark.implicits._
    // pick real bench/train ids from the hash split the operator uses
    val slots = (1L to 60L).map(i => i ->
      spark.range(1).select(
        pmod(Md5Prefix28(lit(i.toString)), lit(100L))).head().getLong(0))
    val benchId = slots.find(_._2 < 10).get._1
    val trainIds = slots.filter(_._2 >= 10).map(_._1).take(2)
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    val distinct = (50 to 70).map(i => s"d$i").mkString(" ")
    val df = Seq(
      (benchId, shared),      // benchmark doc
      (trainIds(0), shared),  // exact copy in train → 100% overlap
      (trainIds(1), distinct) // clean train doc
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminate(df, "doc_id", "text", 10, 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), r.getBoolean(4))).toMap
    assert(!got.contains(benchId), "bench docs are not scored")
    assert(got(trainIds(0)) == ((1.0, true)))
    assert(got(trainIds(1)) == ((0.0, false)))
  }

  test("repetitionStats: mode counts over words and bigrams") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a b"),        // top word 3/4; bigrams: a a, a a, a b → 2/3
      (2L, "p q r s"),        // all distinct → 1/4, 1/3
      (3L, "solo"),           // < 2 words → filtered out
      (4L, "x y " * 6 + "x"), // 13 words: top word 7/13, top bigram 6/12
      (5L, (1 to 13).map(i => s"w$i").mkString(" ")) // 13 distinct words
    ).toDF("doc_id", "text")
    val got = TextFns.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5))).toMap
    assert(got.keySet == Set(1L, 2L, 4L, 5L))
    // short docs below the minWords floor are NEVER flagged: with n words
    // top_bigram_frac >= 1/(n-1), so an all-distinct 4-word doc would
    // otherwise trip the 0.2 default (the stats themselves still emit)
    assert(got(1L) == ((4L, 0.75, 3L, 2.0 / 3.0, false)))
    assert(got(2L) == ((4L, 0.25, 3L, 1.0 / 3.0, false)))
    // past the floor the thresholds apply for real
    assert(got(4L) == ((13L, 7.0 / 13.0, 12L, 0.5, true)))
    assert(got(5L) == ((13L, 1.0 / 13.0, 12L, 1.0 / 12.0, false)))
  }

  test("wide simhash: 48-bit signature extends the 24-bit one bit-for-bit") {
    val docs = Tables.load(spark, sfDir, "documents").limit(50)
    val s24 = Dedup.simhashSignatures(docs, "doc_id", "text", 24)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val s48 = Dedup.simhashSignatures(docs, "doc_id", "text", 48)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s24.keySet == s48.keySet)
    // bits 0..23 read the same hex digits against the same table, so the
    // wide signature's low 24 bits must equal the narrow signature
    s24.foreach { case (id, s) => assert((s48(id) & 0xffffff) == s) }
    // block-LSH at 48 bits still finds all exact-text pairs (hamming 0)
    import spark.implicits._
    val base = (1 to 30).map(i => s"t$i").mkString(" ")
    val dup = Seq((1L, base), (2L, base), (3L, (40 to 70).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearPairs(dup, "doc_id", "text", 2, 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toList == List((1L, 2L, 0)))
  }

  test("dedupAgainst: near-dups resolve to their best corpus match") {
    import spark.implicits._
    val a = (1 to 30).map(i => s"a$i").mkString(" ")
    val b = (100 to 130).map(i => s"b$i").mkString(" ")
    val corpus = Seq((10L, a), (11L, a), (20L, b)).toDF("doc_id", "text")
    val incoming = Seq(
      (501L, a.replace("a5", "q5")), // near-dup of 10 AND 11 → lower id wins
      (502L, (200 to 230).map(i => s"c$i").mkString(" "))) // fresh
      .toDF("doc_id", "text")
    val got = Dedup.dedupAgainst(incoming, corpus, "doc_id", "text", 0.8)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          r.getBoolean(3))).toMap
    assert(got(501L) == ((Some(10L), false)), s"got: $got")
    assert(got(502L) == ((None, true)))
  }

  test("packOffsetsBy: each group's stream equals packing that group alone") {
    import graft.functions.Packing
    val docs = Tables.load(spark, sfDir, "documents")
    val grouped = Packing.packOffsetsBy(docs, Seq("lang"), col("doc_id"),
      size(TextFns.words(col("text"))))
    val lang = docs.select("lang").orderBy("lang").head().getString(0)
    val alone = Packing.packOffsets(docs.filter(col("lang") === lang),
      col("doc_id"), size(TextFns.words(col("text"))))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val slice = grouped.filter(col("lang") === lang)
      .select(col("key"), col("start_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(slice == alone && slice.nonEmpty)
  }

  test("packOffsetsBy keeps NULL group keys as their own stream") {
    import graft.functions.Packing
    import spark.implicits._
    val df = Seq((1L, Option("en"), 5), (2L, Option.empty[String], 7),
      (3L, Option.empty[String], 3)).toDF("id", "lang", "n")
    val out = Packing.packOffsetsBy(df, Seq("lang"), col("id"), col("n"))
      .cache()
    assert(out.count() == 3, "a NULL group must not drop rows")
    val nulls = out.filter(col("lang").isNull)
      .select(col("start_tok"), col("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nulls.length == 2)
    assert(nulls.map(_._1).min == 0L) // the null stream starts at 0
    assert(nulls.map { case (s, n) => s + n }.max == 10L) // and is contiguous
  }

  test("knnJoinWith external probes score id-colliding corpus rows") {
    import spark.implicits._
    def vec(seed: Int) = (0 until 8).map(i =>
      ((seed * 31 + i * 7) % 13 + 1).toFloat).toArray
    val corpus = (0L to 9L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    // external probe numbered 5 with corpus row 5's exact vector: the
    // colliding id must still be scored (and tops the list at cos 1.0)
    val probes = Seq((5L, vec(5))).toDF("probe_id", "__pv")
    val got = Similarity.knnJoinWith(corpus, probes, "vec_id", "embedding", 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.length == 1 && got.head._1 == 5L && got.head._2 == 5L)
    assert(math.abs(got.head._3 - 1.0) < 1e-12)
  }

  test("qualityBand keeps the inner quantile band, bounds inclusive") {
    val docs = Tables.load(spark, sfDir, "documents")
    val kept = TextFns.qualityBand(docs, "doc_id", "text", 0.05, 0.95)
    val n = docs.count()
    val k = kept.count()
    assert(k < n && k >= (n * 85) / 100, s"kept $k of $n")
    // the extremes are gone
    val qs = docs.select(TextFns.qualityScore(col("text")).as("q"))
      .agg(min(col("q")), max(col("q"))).head()
    val keptQs = kept.agg(min(col("quality")), max(col("quality"))).head()
    assert(keptQs.getDouble(0) > qs.getDouble(0))
    assert(keptQs.getDouble(1) < qs.getDouble(1))
  }

  test("binned interval join equals the naive range join") {
    import graft.operators.IntervalJoin
    val raw = Tables.load(spark, sfDir, "events").limit(3000)
    val e = raw.select(col("event_id"), col("user_id"),
      Tables.tsUs(raw).as("ts_us"))
    val l = e.select(col("event_id").as("lid"), col("user_id"),
      col("ts_us").as("lts"))
    val r = e.select(col("user_id"), col("ts_us"))
    val (lo, hi) = (-600000000L, -1L)
    val got = IntervalJoin.binned(l, r, Seq("user_id"), "lts", "ts_us", lo, hi)
      .select(col("lid"), col("ts_us"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.join(r, Seq("user_id"))
      .filter(col("ts_us") >= col("lts") + lo && col("ts_us") <= col("lts") + hi)
      .select(col("lid"), col("ts_us"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == naive && got.nonEmpty)
  }

  test("splitLabel partitions the corpus; train side == hashSample(80)") {
    val docs = Tables.load(spark, sfDir, "documents")
    val labeled = docs.select(col("doc_id"),
      Sampling.splitLabel(col("doc_id"), 80, 10).as("split"))
    val counts = labeled.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == docs.count())
    val train = labeled.filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sampled = Sampling.hashSample(docs, col("doc_id"), 80)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(train == sampled)
  }
}
