package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Sampling, Similarity, TextClean}
import graft.operators.Materializer
import graft.sources.{Changelog, Tables}

/** Round-3 operators: SCD2 history, text cleaning, deterministic sampling,
  * quantized-rescore ANN. */
class NewOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val ordersRowSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("o_orderkey",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("o_totalprice",
      org.apache.spark.sql.types.DoubleType)))

  test("scd2 history: intervals chain, current rows equal materialized state") {
    val script = Changelog.ordersScript(spark, sfDir)
    val hist = Materializer.scd2History(script, "o_orderkey", ordersRowSchema)
      .cache()

    // intervals chain per key: version n's valid_to == version n+1's
    // valid_from (or the DELETE id), and exactly one open interval per
    // key unless the key was deleted
    val badChain = hist.alias("a").join(hist.alias("b"),
        col("a.o_orderkey") === col("b.o_orderkey") &&
          col("a.valid_to") === col("b.valid_from"), "left_anti")
      .filter(col("a.valid_to").isNotNull &&
        col("a.valid_to") % 3 =!= 2) // valid_to at id%3==2 is a DELETE
      .count()
    assert(badChain == 0, "every non-terminal valid_to must open a version")

    // current rows (is_current, not closed by a delete) == batch materialize
    val current = hist.filter(col("is_current"))
      .select(col("o_orderkey"), col("o_totalprice"))
    val expect = Materializer.materialize(script, "o_orderkey", ordersRowSchema)
    assert(current.exceptAll(expect).count() == 0 &&
      expect.exceptAll(current).count() == 0)
    hist.unpersist()
  }

  test("text normalize + redact: ordering and determinism") {
    import spark.implicits._
    val df = Seq(
      ("  Hello   WORLD  ", "plain"),
      ("mail a@b.com or c.d+x@e-f.org now", "emails"),
      ("ip 10.0.0.1 num 12345678 short 123", "mixed")).toDF("t", "k")
    val out = df.select(col("k"),
      TextClean.redactPii(TextClean.normalize(col("t"))).as("r"),
      TextClean.countMatches(TextClean.normalize(col("t")), TextClean.EmailRe)
        .as("n")).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap

    assert(out("plain") == ("hello world", 0))
    // both emails redacted BEFORE the digit-run pass could eat pieces
    assert(out("emails") == ("mail <EMAIL> or <EMAIL> now", 2))
    // IP redacted before digit runs; 3-digit run below threshold kept
    assert(out("mixed") == ("ip <IP> num <NUM> short 123", 0))
  }

  test("hash sampling: deterministic, monotone in pct, stratified cap holds") {
    val docs = Tables.load(spark, sfDir, "documents")
    val s10 = Sampling.hashSample(docs, col("doc_id"), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s20 = Sampling.hashSample(docs, col("doc_id"), 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // determinism across physical layout
    val s10b = Sampling.hashSample(docs.repartition(7), col("doc_id"), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10 == s10b, "sample must not depend on partitioning")
    assert(s10.subsetOf(s20), "pct slices must be monotone (universe sampling)")
    assert(s10.nonEmpty && s20.size > s10.size)

    val capped = Sampling.stratifiedCap(docs, col("lang"), col("doc_id"), 7)
    val perGroup = capped.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(perGroup.forall(_ <= 7) && perGroup.nonEmpty)
    // deterministic selection across physical layout
    val cappedB = Sampling.stratifiedCap(docs.repartition(7), col("lang"),
      col("doc_id"), 7).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(capped.select("doc_id").collect().map(_.getLong(0)).toSet == cappedB)
  }

  test("chunking: windows tile the doc, overlap carries tokens") {
    import spark.implicits._
    import graft.functions.TextFns
    val doc = (1 to 10).map("w" + _).mkString(" ")
    // overlap 1, win 4 → stride 3: starts 0,3,6 (a start at 9 would add
    // nothing — w10 is already covered by the window starting at 6)
    val withOverlap = Seq(doc).toDF("t")
      .select(posexplode(TextFns.chunks(col("t"), 4, 1)))
      .select("col.chunk").as[String].collect().toSeq
    assert(withOverlap == Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    // no overlap: exact tiling, short tail kept
    val tiled = Seq(doc).toDF("t")
      .select(posexplode(TextFns.chunks(col("t"), 4)))
      .select("col.chunk").as[String].collect().toSeq
    assert(tiled == Seq("w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10"))
    // doc shorter than one window → exactly chunk 0
    val short = Seq("a b").toDF("t")
      .select(posexplode(TextFns.chunks(col("t"), 4)))
      .select("col.chunk_idx", "col.n_tokens").as[(Int, Int)].collect().toSeq
    assert(short == Seq((0, 2)))
  }

  test("packing: spans are contiguous, total-preserving, layout-independent") {
    import graft.functions.Packing
    val docs = Tables.load(spark, sfDir, "documents")
    val nTok = size(split(col("text"), " "))
    val packed = Packing.packOffsets(docs, col("doc_id"), nTok,
      buckets = 8, budget = 256).cache()
    val rows = packed.orderBy("start_tok")
      .select("n_tokens", "start_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // the token stream is gapless: each doc starts where the previous ended
    rows.sliding(2).foreach {
      case Array((n0, s0), (_, s1)) => assert(s0 + n0 == s1)
      case _ => ()
    }
    assert(rows.head._2 == 0L)
    // layout-independent: same spans after an arbitrary repartition
    val packedB = Packing.packOffsets(docs.repartition(13), col("doc_id"),
      nTok, buckets = 8, budget = 256)
    assert(packed.exceptAll(packedB).count() == 0 &&
      packedB.exceptAll(packed).count() == 0)
    packed.unpersist()
  }

  test("quantized top-k: high recall vs exact brute force") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val quant = Similarity.quantizedTopK(emb, "vec_id", "embedding", 0L, 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(quant.size == 5)
    // int8 quantization of 64-dim unit-ish vectors keeps ranking nearly
    // intact; require >= 4 of 5 overlap so a genuine regression trips
    assert((exact intersect quant).size >= 4,
      s"recall too low: exact=$exact quant=$quant")
  }
}
