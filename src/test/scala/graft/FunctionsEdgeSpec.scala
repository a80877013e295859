package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Similarity, TextFns}

class FunctionsEdgeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("shingles guard: short docs yield empty sets, not errors") {
    import spark.implicits._
    val df = Seq("one two", "one", "", "a b c", "a b c d").toDF("text")
    val got = df.select(TextFns.shingles(col("text")).as("s"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == Nil && got(1) == Nil && got(2) == Nil)
    assert(got(3) == List("a b c"))
    assert(got(4).toSet == Set("a b c", "b c d"))
  }

  test("ivfTopK: probing every cell recovers the exact brute-force top-k") {
    val emb = sources.Tables.load(spark, sfDir, "embeddings")
    val nCells = emb.select("label").distinct().count().toInt
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivfAll = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
      0L, 5, nProbe = nCells)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivfAll == exact, "nProbe=|cells| must equal brute force")
    // nProbe=1 scans only the nearest cell: results come from one label
    val oneCell = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
      0L, 5, nProbe = 1)
    val labels = oneCell.join(emb.select(col("vec_id"), col("label")), "vec_id")
      .select("label").distinct().count()
    assert(labels == 1)
  }

  test("bm25Rank edges: absent terms, single-term docs, deterministic ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "join join join filter scan"),   // tf saturation on 'join'
      (2L, "join hash"),                     // short doc, two terms
      (3L, "scan filter batch row column"),  // no query terms
      (4L, "join hash"),                     // exact tie with doc 2
      (5L, "hash")                           // single term
    ).toDF("doc_id", "text")
    val ranked = TextFns.bm25Rank(docs, "doc_id", "text",
      Seq("join", "hash"), topN = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // only docs containing ≥1 query term rank
    assert(ranked.map(_._1).toSet == Set(1L, 2L, 4L, 5L))
    // tied docs (2, 4 share text) order by id; identical scores
    val byId = ranked.toMap
    assert(byId(2L) == byId(4L))
    assert(ranked.map(_._1).indexOf(2L) < ranked.map(_._1).indexOf(4L))
    // all scores positive, and ranking is score-descending
    assert(ranked.forall(_._2 > 0))
    assert(ranked.map(_._2).sliding(2).forall {
      case Seq(a, b) => a >= b
      case _ => true
    })
    // terms absent from the corpus match nothing
    assert(TextFns.bm25Rank(docs, "doc_id", "text",
      Seq("nonexistent")).count() == 0)
  }

  test("langId falls back to 'und' below threshold") {
    import spark.implicits._
    val df = Seq(
      "the cat sat on the mat and the dog",  // plenty of en stopwords
      "zzz qqq www rrr ttt yyy uuu iii ooo ppp" // none
    ).toDF("text")
    val got = df.select(TextFns.langId(col("text")).as("l"))
      .collect().map(_.getString(0))
    assert(got(0) == "en" && got(1) == "und")
  }

  test("exact dedup groups identical texts across ids") {
    import spark.implicits._
    val df = Seq((1L, "same text here"), (2L, "same text here"),
      (3L, "different")).toDF("doc_id", "text")
    val got = Dedup.exact(df, "doc_id", "text")
      .orderBy("keeper_id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("keeper_id") == 1L &&
      got(0).getAs[Long]("copies") == 2L)
  }

  test("minhash signatures are stable and identical for identical docs") {
    import spark.implicits._
    val df = Seq((1L, "w1 w2 w3 w4 w5 w6"), (2L, "w1 w2 w3 w4 w5 w6"))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(df, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
    assert((1 to 4).forall(i => sig(0).getAs[Long](s"m${i - 1}") ==
      sig(1).getAs[Long](s"m${i - 1}")))
  }

  test("cosine of identical vectors is exactly 1 within fold error") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    val c = df.select(Similarity.cosine(col("v"), col("v")).as("c"))
      .collect().head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }
}
