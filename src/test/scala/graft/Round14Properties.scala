package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bpe, JpegCodec, Multimodal, Similarity, Unigram}

/** Round-14 randomized properties: the video frame-split path under
  * fuzz (an executor walk over a corrupt container must never throw),
  * tokenizer total-coverage invariants over random unicode (every
  * tokenizer must reconstruct its input words — a dropped or invented
  * character is a budget-accounting bug no fixture test would catch),
  * and PQ structural invariants over seeded random corpora. */
class Round14Properties extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("video signature path never throws on arbitrary bytes (fuzz)") {
    val rng = new scala.util.Random(1414)
    def sig(bytes: Array[Byte]): Long = {
      val df = Seq((1L, "video/mp4", bytes, bytes.length.toLong))
        .toDF("doc_id", "kind", "content", "byte_len")
      Multimodal.videoPhashSignatures(spark, df).count()
    }
    // pure garbage (collect lengths into one DF pass for speed)
    val garbage = (0 until 150).map { _ =>
      Array.fill[Byte](rng.nextInt(600))(rng.nextInt(256).toByte)
    }
    val gdf = garbage.zipWithIndex
      .map { case (b, i) => (i.toLong, "video/mp4", b, b.length.toLong) }
      .toDF("doc_id", "kind", "content", "byte_len")
    Multimodal.videoPhashSignatures(spark, gdf).count() // must not throw
    // mutated-valid containers: the frame split + per-frame decode
    val good = {
      val frames = (0 until 3).map { fi =>
        JpegCodec.encode(Array.fill(72 * 64)(50 + fi * 40), 72, 64,
          JpegCodec.Gray, JpegCodec.unitQuant)
      }
      Multimodal.VideoHeader.mp4Bytes("isom", 1000, 3000L, 72, 64,
        v1 = false, frames.reduce(_ ++ _))
    }
    val mutated = (0 until 250).map { _ =>
      val b = good.clone()
      (0 to rng.nextInt(4)).foreach { _ =>
        b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      }
      b
    } ++ (0 until 80).map(_ => good.take(rng.nextInt(good.length)))
    val mdf = mutated.zipWithIndex
      .map { case (b, i) => (i.toLong, "video/mp4", b, b.length.toLong) }
      .toDF("doc_id", "kind", "content", "byte_len")
    Multimodal.videoPhashSignatures(spark, mdf).count() // must not throw
    // the untouched container still yields its 3 frames
    assert(sig(good) == 3L)
  }

  test("splitJpegFrames is exact on encoder streams and total on garbage") {
    val rng = new scala.util.Random(77)
    (0 until 50).foreach { _ =>
      val n = 1 + rng.nextInt(5)
      val frames = (0 until n).map { _ =>
        JpegCodec.encode(
          Array.fill(72 * 64)(rng.nextInt(256)), 72, 64,
          JpegCodec.Gray, JpegCodec.unitQuant)
      }
      val split = Multimodal.splitJpegFrames(frames.reduce(_ ++ _))
      assert(split.length == n)
      split.zip(frames).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b))
      }
    }
    (0 until 200).foreach { _ =>
      val junk = Array.fill[Byte](rng.nextInt(300))(rng.nextInt(256).toByte)
      Multimodal.splitJpegFrames(junk) // must not throw
    }
  }

  test("all three tokenizers reconstruct their input words (coverage)") {
    val rng = new scala.util.Random(2024)
    val wordRe = java.util.regex.Pattern
      .compile("[a-z0-9]+|[^a-z0-9 \t\n\r\f]")
    def wordsOf(s: String): Seq[String] = {
      val m = wordRe.matcher(s)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (m.find()) out += m.group()
      out.toSeq
    }
    val texts = (0 until 120).map { _ =>
      val len = rng.nextInt(120)
      (0 until len).map { _ =>
        val r = rng.nextInt(100)
        if (r < 55) ('a' + rng.nextInt(26)).toChar
        else if (r < 65) ('0' + rng.nextInt(10)).toChar
        else if (r < 80) ' '
        else if (r < 88) ".,!?;:-()'\"".charAt(rng.nextInt(11))
        else if (r < 94) "\t\n\r\f".charAt(rng.nextInt(4))
        else (0xe0 + rng.nextInt(0x200)).toChar // non-ASCII BMP
      }.mkString
    }
    import org.apache.spark.sql.functions._
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
    val rows = df.select(col("i"), col("t"),
      graft.functions.Subword.tokens(col("t")).as("sw"),
      Bpe.tokens(col("t")).as("bp"),
      Unigram.tokens(col("t")).as("un")).collect()
    rows.foreach { r =>
      val words = wordsOf(r.getString(1))
      val joinedWords = words.mkString("")
      // BPE and unigram: token concatenation IS the word concatenation
      assert(r.getSeq[String](3).mkString("") == joinedWords,
        s"bpe dropped/invented chars on text ${r.getInt(0)}")
      assert(r.getSeq[String](4).mkString("") == joinedWords,
        s"unigram dropped/invented chars on text ${r.getInt(0)}")
      // WordPiece may emit [UNK] (whole word) but never loses a WORD:
      // stripping ## continuations and replacing [UNK]-runs must keep
      // the word COUNT consistent — every word yields >= 1 token
      val sw = r.getSeq[String](2)
      if (words.isEmpty) assert(sw.isEmpty)
      else assert(sw.nonEmpty)
    }
  }

  test("pq codes are structurally sound over seeded random corpora") {
    val rng = new scala.util.Random(99)
    (0 until 3).foreach { round =>
      val n = 60 + rng.nextInt(100)
      val vs = (0 until n).map { i =>
        (i.toLong, Array.fill(64)((rng.nextGaussian() * 3).toFloat))
      }
      val df = vs.toDF("vec_id", "embedding").repartition(1 + round * 3)
      val cb = Similarity.pqTrain(df, "vec_id", "embedding", 8, 16, 2, 64)
      val grid = cb.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(grid ==
        (for (j <- 0 until 8; c <- 0 until 16) yield (j, c)).toSet)
      val codes = Similarity.pqEncode(df, cb, "vec_id", "embedding", 8, 16)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(codes.size == n)
      codes.values.foreach { cs =>
        assert(cs.length == 8)
        assert(cs.forall(c => c >= 0 && c < 16))
      }
    }
  }
}
