package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity
import graft.operators.Materializer
import org.apache.spark.sql.types._

/** Round-5 operators: multi-probe IVF kNN join, ANN recall@k, SCD2
  * point-in-time reads, TopKAgg id-type guard. */
class Round5OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  // two well-separated cells on axis 0/1 plus a far "decoy" cell on axis 2;
  // 4 dims keep the arithmetic readable
  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, "a", Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (1L, "a", Array(1.0f, 0.2f, 0.0f, 0.0f)),
      (2L, "a", Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, "b", Array(0.1f, 1.0f, 0.0f, 0.0f)),
      (4L, "b", Array(0.2f, 1.0f, 0.0f, 0.0f)),
      (5L, "c", Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (6L, "c", Array(0.0f, 0.0f, 0.9f, 0.1f))
    ).toDF("vec_id", "label", "embedding")
  }

  test("ivfKnnJoin searches only each probe's nProbe nearest cells") {
    import spark.implicits._
    val probes = Seq((0L, Array(1.0f, 0.1f, 0.0f, 0.0f)))
      .toDF("probe_id", "__pv")
    val got = Similarity.ivfKnnJoin(corpus, probes, "vec_id", "embedding",
      "label", k = 10, nProbe = 2, dims = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toList
    // nProbe=2 for an a-axis probe → cells a and b searched, cell c never:
    // ids 5,6 must be absent even with k larger than all candidates
    val ids = got.map(_._2)
    assert(!ids.contains(5L) && !ids.contains(6L), "unprobed cell leaked in")
    assert(!ids.contains(0L), "self-match must be excluded")
    assert(ids.toSet == Set(1L, 2L, 3L, 4L))
    // ranks are contiguous from 1 in cosine order
    assert(got.map(_._1) == (1 to ids.length).toList)
    assert(got.take(2).map(_._2).toSet == Set(1L, 2L),
      "own-cell neighbors rank above the other cell's")
  }

  test("recallAtK: per-probe hit counts, ANN-missed probes score 0") {
    import spark.implicits._
    val exact = Seq(
      (10L, 100L), (10L, 101L), (10L, 102L), // probe 10: 3 exact
      (20L, 200L), (20L, 201L))              // probe 20: 2 exact
      .toDF("probe_id", "neighbor_id")
    val ann = Seq(
      (10L, 101L), (10L, 999L), (10L, 102L)) // hits 2 of 3; probe 20 absent
      .toDF("probe_id", "neighbor_id")
    val got = Similarity.recallAtK(ann, exact)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(10L) == ((3L, 2L, 2.0 / 3.0)))
    assert(got(20L) == ((2L, 0L, 0.0)), "missed probe still gets a row")
  }

  test("IVF recall of a separable corpus is perfect for in-cell probes") {
    import spark.implicits._
    val probes = Seq(
      (0L, Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("probe_id", "__pv")
    val ivf = Similarity.ivfKnnJoin(corpus, probes, "vec_id", "embedding",
      "label", k = 2, nProbe = 2, dims = 4)
    val bf = Similarity.knnJoinWith(corpus, probes, "vec_id", "embedding",
      k = 2, excludeSelf = true)
    val rec = Similarity.recallAtK(ivf, bf)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rec == Map(0L -> 1.0, 5L -> 1.0))
  }

  test("scd2AsOf: state at a mid-stream changeset id") {
    import spark.implicits._
    // key 1: INSERT(id 10) → UPDATE(id 40); key 2: INSERT(20) → DELETE(50);
    // key 3: INSERT(60) after the bound
    val chg = Seq(
      (10L, "INSERT", """{"k":1,"v":"a"}"""),
      (20L, "INSERT", """{"k":2,"v":"b"}"""),
      (40L, "UPDATE", """{"k":1,"v":"a2"}"""),
      (50L, "DELETE", null.asInstanceOf[String]),
      (60L, "INSERT", """{"k":3,"v":"c"}"""))
      .toDF("id", "action", "new_values")
      .withColumn("old_values",
        when(col("action") === "DELETE", lit("""{"k":2}"""))
          .otherwise(lit(null).cast("string")))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val hist = Materializer.scd2History(chg, "k", schema)
    def stateAt(id: Long) = {
      val bound = spark.range(1).select(lit(id).as("__asof"))
      Materializer.scd2AsOf(hist, bound)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(stateAt(30L) == Map(1L -> "a", 2L -> "b"), "pre-update versions")
    assert(stateAt(45L) == Map(1L -> "a2", 2L -> "b"), "update visible")
    assert(stateAt(55L) == Map(1L -> "a2"), "delete closes key 2's interval")
    assert(stateAt(60L) == Map(1L -> "a2", 3L -> "c"), "late insert appears")
  }

  test("embedClusters: components of the cosine pair graph, singletons self-label") {
    val got = Similarity.embedClusters(corpus, "vec_id", "embedding", 0.9,
      dims = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // three tight direction-clusters; cross-cluster cosines ~0.1-0.2
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 3L, 4L -> 3L, 5L -> 5L, 6L -> 5L))
  }

  test("mixToProportions: bottleneck kept whole, others downsample, unlisted drop") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val targets = Map("en" -> 20L, "de" -> 30L, "fr" -> 30L, "zh" -> 20L)
    val before = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = graft.functions.Sampling
      .mixToProportions(docs, col("lang"), col("doc_id"), targets)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!after.contains("es"), "unlisted domain must drop")
    // the bottleneck domain (max target/count) survives whole
    val star = targets.keys.maxBy(d => targets(d).toDouble / before(d))
    assert(after(star) == before(star), s"bottleneck $star must be kept whole")
    // achieved mix tracks the target ratios (hash granularity ±, small N)
    val total = after.values.sum.toDouble
    targets.foreach { case (d, p) =>
      val want = p.toDouble / targets.values.sum
      val got = after.getOrElse(d, 0L) / total
      assert(math.abs(got - want) < 0.12, s"$d: got $got want $want")
    }
    // determinism: same input → identical selected set
    val a = graft.functions.Sampling
      .mixToProportions(docs, col("lang"), col("doc_id"), targets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.functions.Sampling
      .mixToProportions(docs.repartition(13), col("lang"), col("doc_id"), targets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "selection must be layout-independent")
  }

  test("upsampleByWeight: integral copies exact, fractional hash-decided") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, "x")).toDF("id", "v")
    def copies(permille: Int) = graft.functions.Sampling
      .upsampleByWeight(df, col("id"), lit(permille))
      .groupBy(col("id")).agg(count(lit(1)).as("n"),
        sort_array(collect_list(col("copy_idx"))).as("idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).toList)).toList
    assert(copies(2000).forall { case (_, n, idx) =>
      n == 2 && idx == List(0L, 1L) }, "2.0x = exactly two copies")
    assert(copies(0).isEmpty, "0x drops every row")
    assert(copies(-500).isEmpty,
      "negative weight drops rows (no truncation-toward-zero copies)")
    val frac = copies(2500)
    assert(frac.forall { case (_, n, idx) =>
      (n == 2L || n == 3L) && idx == (0L until n).toList })
    val mean = frac.map(_._2).sum.toDouble / 200
    assert(mean > 2.2 && mean < 2.8, s"2.5x mean copies ~2.5, got $mean")
  }

  test("streaming decontamination admits only clean, shingled docs") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-decon").toString
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // contaminated
      (2L, "completely different words in this document here"), // clean
      (3L, "too short")) // < 3 words: no shingles, not admitted
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(s"$tmp/in")
    val q = graft.streaming.StreamOps.decontaminateTo(
      stream, bench, s"$tmp/out", s"$tmp/ckpt", "doc_id", "text")
    q.awaitTermination()
    val admitted = spark.read.parquet(s"$tmp/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(2L))
  }

  test("SQL surface: composed functions expand to the library's Column trees") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(3.0F, 4.0F), array(3.0F, 4.0F)) AS c, " +
        "dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d, " +
        "lang_id('the of and to a quick brown fox') AS l, " +
        "redact_pii(norm_text('  mail A@B.COM  now ')) AS p, " +
        "split_label(42, 80, 10) AS s, " +
        "size(shingles('a b c d')) AS n")
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
    assert(r.getString(2) == "en")
    assert(r.getString(3) == "mail <EMAIL> now")
    assert(Set("train", "val", "test")(r.getString(4)))
    assert(r.getInt(5) == 2) // "a b c", "b c d"
    // parity with the library API — same tree, same result
    import spark.implicits._
    val lib = Seq(("a b c d")).toDF("t")
      .select(graft.functions.TextFns.shingles(col("t")).as("sh"))
      .collect().head.getSeq[String](0).toSet
    val sql = spark.sql("SELECT shingles('a b c d') AS sh")
      .collect().head.getSeq[String](0).toSet
    assert(lib == sql)
    // round-5 additions: quality/chunking/bucketing from SQL
    val r2 = spark.sql(
      "SELECT bucket_us(-11L, 10) AS b, " +
        "size(chunk_text('a b c d e f', 4, 2)) AS nc, " +
        "quality_score('the cat sat on the mat') AS q").collect().head
    assert(r2.getLong(0) == -20L) // floor, not truncate
    assert(r2.getInt(1) == 2) // windows at 0 and 2
    val libQ = Seq(("the cat sat on the mat")).toDF("t")
      .select(graft.functions.TextFns.qualityScore(col("t")).as("q"))
      .collect().head.getDouble(0)
    assert(r2.getDouble(2) == libQ)
  }

  test("integral-id guard fails loudly on string ids") {
    import spark.implicits._
    val strIds = corpus.withColumn("vec_id", col("vec_id").cast("string"))
    val probes = Seq((0L, Array(1.0f, 0.1f, 0.0f, 0.0f)))
      .toDF("probe_id", "__pv")
    val ex = intercept[IllegalArgumentException] {
      Similarity.knnJoinWith(strIds, probes, "vec_id", "embedding", 2)
    }
    assert(ex.getMessage.contains("integral"))
  }
}
