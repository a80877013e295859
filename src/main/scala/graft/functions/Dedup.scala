package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines (SURVEY §2.6):
 * exact, MinHash+LSH, SimHash, and exact n-gram-Jaccard.
 *
 * Scale design:
 *  - exact dedup is one hash-partitioned groupBy on the content hash —
 *    map-side partial aggregation, single shuffle keyed by a 128-bit hash,
 *    uniformly distributed (no skew by construction).
 *  - MinHash-LSH is the 100 TB near-dup path: per-document signatures are
 *    narrow map work; candidate generation shuffles only (band, key) pairs
 *    (docs × bands rows, NOT docs² pairs); the exact-Jaccard verify runs
 *    only on candidates. This is the shingle→minhash→band→bucket-join
 *    pipeline of Broder-style near-dup detection.
 *  - SimHash buckets docs by a short locality-sensitive bit signature —
 *    equal signatures are candidate near-dups; one groupBy/self-join on a
 *    16-bit key.
 *  - n-gram-Jaccard "exact" mode uses an inverted shingle index join (pairs
 *    that share ≥1 shingle), not a cross join — still superlinear in the
 *    worst case, which is why LSH is the default at scale.
 */
object Dedup {

  /** md5 hash-family member: h_i(s) = md5(i || '|' || s), compared as hex
    * strings (lexicographic order ≡ unsigned numeric order for hex). */
  private def saltedHash(i: Int, s: Column): Column =
    md5(concat(lit(i.toString), lit("|"), s))

  /**
   * Exact dedup: group by content hash, keep the smallest id as the
   * representative, count the copies.
   */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("copies"))

  /**
   * Per-document MinHash band minima. `numHashes` salted-md5 hash functions;
   * one groupBy computes all minima in a single pass (map-side combinable).
   * Returns (idCol, m0..m{n-1}).
   */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       numHashes: Int = 8): DataFrame = {
    val sh = df.select(col(idCol),
      explode(TextFns.shingles(col(textCol))).as("s"))
    sh.groupBy(col(idCol))
      .agg(min(saltedHash(0, col("s"))).as("m0"),
        (1 until numHashes).map(i =>
          min(saltedHash(i, col("s"))).as(s"m$i")): _*)
  }

  /**
   * MinHash-LSH candidate pairs: r=2 rows per band (band key = md5 of two
   * concatenated minima), `numBands` bands. Pairs sharing ≥1 band key are
   * candidates. P(candidate) = 1-(1-j²)^b — steep around j≈0.7 for b=4.
   */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
                    numBands: Int = 4): DataFrame = {
    val sig = minhashSignature(df, idCol, textCol, numBands * 2)
    val bands = array((0 until numBands).map(i =>
      md5(concat(col(s"m${2 * i}"), col(s"m${2 * i + 1}")))): _*)
    val keyed = sig.select(col(idCol), posexplode(bands).as(Seq("band", "key")))
    val a = keyed.select(col(idCol).as("doc_a"), col("band"), col("key"))
    val b = keyed.select(col(idCol).as("doc_b"), col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /**
   * MinHash-LSH near-dup pairs, verified: candidates from [[lshCandidates]],
   * then exact shingle-Jaccard computed ONLY on candidates; keep >= minJaccard.
   */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   minJaccard: Double = 0.8): DataFrame = {
    val sets = df.select(col(idCol),
      TextFns.shingles(col(textCol)).as("sset"))
    val cands = lshCandidates(df, idCol, textCol)
    cands
      .join(sets.select(col(idCol).as("doc_a"), col("sset").as("sa")), "doc_a")
      .join(sets.select(col(idCol).as("doc_b"), col("sset").as("sb")), "doc_b")
      .withColumn("jac",
        size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))))
      .filter(col("jac") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }

  /**
   * 24-bit SimHash over the distinct shingles of a document. Bit j is set
   * when more shingles hash to 1 than to -1 in that position (position =
   * j-th hex digit of the shingle's md5, high bit of the digit). Documents
   * with equal signatures are near-dup candidates. Shingles (not bare
   * words) keep the signature discriminative on small-vocabulary corpora.
   */
  def simhash(text: Column, bits: Int = 24): Column = {
    val dw = TextFns.shingles(text)
    val terms = (0 until bits).map { j =>
      val ones = size(filter(dw, w =>
        substring(md5(w), j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f")))
      when(ones * 2 > size(dw), lit(1 << j)).otherwise(lit(0))
    }
    terms.reduce(_ + _).cast("int")
  }

  /** SimHash bucket pairs: documents sharing an identical signature. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = df.select(col(idCol), simhash(col(textCol)).as("sim"))
    val a = sh.select(col(idCol).as("doc_a"), col("sim"))
    val b = sh.select(col(idCol).as("doc_b"), col("sim"))
    a.join(b, "sim").filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sim").as("simhash"))
  }

  /**
   * Exact n-gram-Jaccard near-dup pairs via an inverted shingle index:
   * pairs sharing at least `minShared` shingles are scored exactly.
   */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   minJaccard: Double = 0.8, minShared: Int = 2): DataFrame = {
    val sets = df.select(col(idCol), TextFns.shingles(col(textCol)).as("sset"))
    val inv = sets.select(col(idCol), explode(col("sset")).as("s"))
    val shared = inv.select(col(idCol).as("doc_a"), col("s"))
      .join(inv.select(col(idCol).as("doc_b"), col("s")), Seq("s"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .filter(col("inter") >= minShared)
    shared
      .join(sets.select(col(idCol).as("doc_a"), size(col("sset")).as("na")), "doc_a")
      .join(sets.select(col(idCol).as("doc_b"), size(col("sset")).as("nb")), "doc_b")
      .withColumn("jac", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")))
      .filter(col("jac") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }
}
