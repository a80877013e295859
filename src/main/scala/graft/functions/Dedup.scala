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
 *    narrow map work (ONE md5 per shingle; the hash family is affine
 *    transforms of that one digest, so adding hash functions is ~free);
 *    candidate generation shuffles only (band, key) pairs (docs × bands
 *    rows, NOT docs² pairs); the exact-Jaccard verify runs only on
 *    candidates. This is the shingle→minhash→band→bucket-join pipeline of
 *    Broder-style near-dup detection.
 *  - SimHash is computed relationally (explode shingles → 24 conditional
 *    sums → bits), one md5 per shingle, one map-side-combinable shuffle.
 *  - n-gram-Jaccard "exact" mode uses an inverted shingle index join (pairs
 *    that share ≥1 shingle), not a cross join — still superlinear in the
 *    worst case, which is why LSH is the default at scale.
 */
object Dedup {

  /** 28-bit integer hash of a shingle: prefix of its md5. One digest per
    * shingle; all derived hash functions reuse it. Native codegen'd
    * expression ([[Md5Prefix28]]) — value-identical to
    * `conv(substring(md5(s), 1, 7), 16, 10)`, which the oracles use. */
  private def hash28(s: Column): Column = Md5Prefix28(s)

  // Affine hash family over hash28: h_i(x) = (A(i)·x + B(i)) mod P.
  // P is the Mersenne prime 2^31-1; A·x stays well under 2^63.
  val P = 2147483647L
  private val A = Seq(1299721L, 15485863L, 32452843L, 49979687L,
    67867967L, 86028121L, 104395301L, 122949823L)
  private val B = Seq(104729L, 1299709L, 15485857L, 32452841L,
    49979693L, 67867979L, 86028157L, 104395303L)

  private def affine(i: Int, x: Column): Column =
    pmod(lit(A(i)) * x + lit(B(i)), lit(P))

  /** SQL rendering of the same family for the DuckDB oracles. */
  def affineSql(i: Int, x: String): String =
    s"(${A(i)} * $x + ${B(i)}) % $P"

  def hash28Sql(s: String): String =
    s"CAST('0x' || substring(md5($s), 1, 7) AS BIGINT)"

  /** 60-bit md5 prefix — wide enough that hash-level set arithmetic is
    * collision-free in practice (P[any collision across a pair's shingle
    * sets] ≈ |A|·|B| / 2^60). Same builtin-only chain as the commutative
    * checksum's 60-bit xor slice (Checksum.scala), DuckDB twin below. */
  private[graft] def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  def hash60Sql(s: String): String =
    s"CAST('0x' || substring(md5($s), 1, 15) AS BIGINT)"

  /**
   * Exact dedup: group by content hash, keep the smallest id as the
   * representative, count the copies.
   */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("copies"))

  /**
   * Dedup by CANONICAL URL ([[TextClean.canonicalizeUrl]]) keeping the
   * best-quality document per canonical key — the crawl-corpus pass
   * that collapses re-encoded links (tracking params, fragments, host
   * case, default ports) to one kept copy. "Best" = highest
   * `qualityCol`, ties to the smallest id (deterministic). Returns one
   * row per canonical URL: (canonical_url, idCol = the keeper, n_dups).
   *
   * Scale shape: the canonicalization is a narrow scan-speed map; the
   * keep-best is ONE hash shuffle on the canonical key (a min/max-style
   * struct agg, map-side combinable — no window over the whole corpus,
   * no skew beyond genuinely hot URLs, which salting handles upstream
   * if a single URL dominates a shard).
   */
  def byCanonicalUrl(df: DataFrame, urlCol: String, qualityCol: Column,
                     idCol: String): DataFrame =
    df.select(TextClean.canonicalizeUrl(col(urlCol)).as("canonical_url"),
        col(idCol), qualityCol.as("__q"))
      .groupBy(col("canonical_url"))
      // max over (quality ASC, id DESC as -id): picks highest quality,
      // then SMALLEST id — a struct-ordering agg instead of a window,
      // so the pass stays one shuffle with partial aggregation
      .agg(
        max(struct(col("__q"), (-col(idCol)).as("__nid")))
          .getField("__nid").as("__keep"),
        count(lit(1)).as("n_dups"))
      .select(col("canonical_url"), (-col("__keep")).as(idCol),
        col("n_dups"))

  /**
   * Per-document MinHash signature: minima of `numHashes` affine hashes of
   * the 28-bit shingle digests. One groupBy computes all minima in a single
   * pass (map-side combinable). Returns (idCol, m0..m{n-1}) as longs.
   */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       numHashes: Int = 8): DataFrame =
    minhashSignatureFromSets(
      df.select(col(idCol), TextFns.shingles(col(textCol)).as("sset")),
      idCol, numHashes)

  /** Signature from precomputed shingle sets (column `sset`). */
  private def minhashSignatureFromSets(sets: DataFrame, idCol: String,
                                       numHashes: Int): DataFrame = {
    val sh = sets.select(col(idCol), explode(col("sset")).as("s"))
      .withColumn("hh", hash28(col("s")))
    sh.groupBy(col(idCol))
      .agg(min(affine(0, col("hh"))).as("m0"),
        (1 until numHashes).map(i =>
          min(affine(i, col("hh"))).as(s"m$i")): _*)
  }

  /**
   * MinHash-LSH candidate pairs: r=2 rows per band (band key = md5 of two
   * concatenated minima), `numBands` bands. Pairs sharing ≥1 band key are
   * candidates. P(candidate) = 1-(1-j²)^b — steep around j≈0.7 for b=4.
   */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
                    numBands: Int = 4): DataFrame =
    lshCandidatesFromSets(
      df.select(col(idCol), TextFns.shingles(col(textCol)).as("sset")),
      idCol, numBands)

  /** (id, band, bkey) LSH keys for precomputed shingle sets — the unit the
   *  streaming dedup accumulates as its admitted-corpus index. */
  def bandKeysFromSets(sets: DataFrame, idCol: String,
                       numBands: Int = 4): DataFrame = {
    val sig = minhashSignatureFromSets(sets, idCol, numBands * 2)
    val bands = array((0 until numBands).map(i =>
      md5(concat_ws("|", col(s"m${2 * i}"), col(s"m${2 * i + 1}")))): _*)
    sig.select(col(idCol), posexplode(bands).as(Seq("band", "bkey")))
  }

  /** Shingle sets (id, sset) — shared shape between batch and streaming. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFns.shingles(col(textCol)).as("sset"))

  private def lshCandidatesFromSets(sets: DataFrame, idCol: String,
                                    numBands: Int): DataFrame = {
    val keyed = bandKeysFromSets(sets, idCol, numBands)
    val a = keyed.select(col(idCol).as("doc_a"), col("band"), col("bkey"))
    val b = keyed.select(col(idCol).as("doc_b"), col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /**
   * MinHash-LSH near-dup pairs, verified: candidates from [[lshCandidates]],
   * then exact shingle-Jaccard computed ONLY on candidates; keep >= minJaccard.
   * The shingle sets are lazily localCheckpoint'ed: they feed the signature
   * pipeline AND both sides of the verify join, and Spark has no
   * cross-branch CSE — without the checkpoint the shingle construction
   * runs three times per execution.
   */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   minJaccard: Double = 0.8): DataFrame = {
    val sets = df.select(col(idCol),
      TextFns.shingles(col(textCol)).as("sset"))
      .localCheckpoint(false)
    val cands = lshCandidatesFromSets(sets, idCol, 4)
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
   * Hex characters whose nibble has bit (8 >> maskIdx) set — the per-bit
   * membership tables for SimHash bit extraction. Bit j of a signature
   * reads hex digit j%32 of the shingle md5 against table j/32, so up to
   * 128 signature bits derive from ONE digest. Public because the DuckDB
   * oracles generate the identical CASE tables from it.
   */
  val simhashBitChars: Seq[Seq[String]] = Seq(
    Seq("8", "9", "a", "b", "c", "d", "e", "f"), // nibble bit 8
    Seq("4", "5", "6", "7", "c", "d", "e", "f"), // nibble bit 4
    Seq("2", "3", "6", "7", "a", "b", "e", "f"), // nibble bit 2
    Seq("1", "3", "5", "7", "9", "b", "d", "f")) // nibble bit 1

  /**
   * Relational SimHash signatures: explode shingles, hash each ONCE, then
   * `bits` conditional ±1 sums (bit j reads hex digit j%32 of the shingle
   * md5 against [[simhashBitChars]] table j/32); signature bit j set when
   * the sum is positive. One map-side-combinable shuffle on the doc id.
   * The signature column is INT for bits ≤ 31 (back-compatible) and LONG
   * beyond — wide signatures are what keep the block-LSH buckets selective
   * at corpus scale (see [[simhashNearPairs]]).
   */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        bits: Int = 24): DataFrame = {
    require(bits >= 1 && bits <= 63, s"bits=$bits out of range")
    // ONE native digest+bit-extract per shingle (Md5SignBits) instead of
    // `bits` substring/IN predicates over a materialized hex string —
    // this is the hottest row stream of the simhash family
    val sh = df.select(col(idCol),
      explode(TextFns.shingles(col(textCol))).as("s"))
      .withColumn("sb", Md5SignBits(col("s"), bits))
    val sums = sh.groupBy(col(idCol)).agg(
      sum(bitTerm(0)).as("s0"),
      (1 until bits).map(j => sum(bitTerm(j)).as(s"s$j")): _*)
    sums.select(col(idCol),
      (0 until bits).map(j =>
        when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).cast(if (bits <= 31) "int" else "long").as("simhash"))
  }

  // ±1 from bit j of the per-shingle sign-bit word
  private def bitTerm(j: Int): Column =
    shiftright(col("sb"), j).bitwiseAND(lit(1L)) * 2 - 1

  /** SimHash bucket pairs: documents sharing an identical signature. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = simhashSignatures(df, idCol, textCol)
    val a = sh.select(col(idCol).as("doc_a"), col("simhash"))
    val b = sh.select(col(idCol).as("doc_b"), col("simhash"))
    a.join(b, "simhash").filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("simhash"))
  }

  /**
   * SimHash near-pairs within hamming distance `maxHamming` — pigeonhole
   * block LSH: the signature splits into maxHamming+1 equal blocks, and
   * any pair within distance k must agree EXACTLY on at least one block
   * (k flipped bits cannot touch all k+1 blocks). Candidates join on
   * (block, value) — never the doc² pair space — then the exact
   * `bit_count(xor)` verifies. The standard scalable form of "similar
   * simhash" retrieval; [[simhashPairs]] is the maxHamming=0 special case.
   *
   * Scale sizing: each block has 2^(bits/(k+1)) buckets, so the
   * bucket-local pair space is O(n²/2^width) per block — with the 24-bit
   * default (8-bit blocks) buckets saturate beyond ~10^5 docs (10× probe:
   * 10.3 s at 50k docs). At corpus scale use a wide signature, e.g.
   * bits=48 with maxHamming=2 (16-bit blocks, 65k buckets per block —
   * long-typed signatures support up to 63 bits from the same single
   * md5 digest).
   */
  def simhashNearPairs(df: DataFrame, idCol: String, textCol: String,
                       maxHamming: Int = 2, bits: Int = 24): DataFrame =
    hammingNearPairs(simhashSignatures(df, idCol, textCol, bits),
      idCol, "simhash", maxHamming, bits)

  /**
   * Generic pigeonhole near-pair join over ANY integer hash column —
   * the machinery [[simhashNearPairs]] describes, factored out so every
   * hamming-space near-dup (text simhash, perceptual image dHash) shares
   * one implementation. Full-width 64-bit hashes are supported: block
   * extraction uses an UNSIGNED shift so a set sign bit lands in the top
   * block's value instead of smearing through an arithmetic shift.
   */
  def hammingNearPairs(sig: DataFrame, idCol: String, hashCol: String,
                       maxHamming: Int, bits: Int): DataFrame = {
    val blocks = maxHamming + 1
    require(bits >= 1 && bits <= 64, s"bits=$bits out of range")
    require(bits % blocks == 0,
      s"bits=$bits must divide into maxHamming+1=$blocks equal blocks")
    val width = bits / blocks
    val mask = if (width == 64) -1L else (1L << width) - 1
    val keyed = sig.select(col(idCol), col(hashCol).cast("long").as("__sig"),
      posexplode(array((0 until blocks).map(b =>
        shiftrightunsigned(col(hashCol).cast("long"), b * width)
          .bitwiseAND(lit(mask))): _*)).as(Seq("blk", "bval")))
    val a = keyed.select(col(idCol).as("doc_a"), col("__sig").as("__sa"),
      col("blk"), col("bval"))
    val b = keyed.select(col(idCol).as("doc_b"), col("__sig").as("__sb"),
      col("blk"), col("bval"))
    a.join(b, Seq("blk", "bval"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(__sa ^ __sb)").cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Full dedup cascade → cluster assignment per document. This is the
   * operator a training-data pipeline actually runs to DROP duplicates:
   *
   *  1. exact dedup: identical texts collapse to one representative
   *     (cheap hash groupBy — at web scale this removes the bulk);
   *  2. near-dup pairs between representatives (MinHash-LSH + exact
   *     Jaccard verify — the expensive step now runs on unique texts);
   *  3. connected components over the near-dup graph (iterative min-label
   *     propagation; near-dup clusters are small cliques, so convergence
   *     takes O(cluster diameter) ≈ 2-3 rounds);
   *  4. every document (including exact copies) maps to its cluster's
   *     minimum doc id — keep rows where doc_id == cluster_id, drop the
   *     rest.
   *
   * Returns (idCol, cluster_id).
   */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
                      minJaccard: Double = 0.8,
                      maxIterations: Int = 10): DataFrame = {
    // 1. exact groups: every doc → representative (min id of its text)
    val withHash = df.select(col(idCol), md5(col(textCol)).as("__h"))
    val reps = withHash.groupBy("__h").agg(min(col(idCol)).as("__rep"))
    val docToRep = withHash.join(reps, "__h")
      .select(col(idCol), col("__rep"))

    // 2. near-dup pairs between representatives only
    val repDocs = df.join(
      reps.select(col("__rep").as(idCol)), Seq(idCol), "left_semi")
    val pairs = minhashDedup(repDocs, idCol, textCol, minJaccard)
      .select(col("doc_a"), col("doc_b"))

    // 3. connected components over the pair graph
    val labels = connectedComponents(pairs, maxIterations)

    // 4. every doc resolves through its representative: edge-connected
    // reps carry their propagated label, singleton reps label themselves;
    // exact copies inherit whatever their representative resolved to
    docToRep.join(labels, docToRep("__rep") === labels("node"), "left")
      .select(col(idCol),
        coalesce(col("label"), col("__rep")).as("cluster_id"))
  }

  /**
   * Connected components over an undirected edge list (doc_a, doc_b) →
   * (node, label) with label = the component's minimum node id.
   *
   * The edge set is tiny relative to the corpus (only verified near-dup
   * pairs), so the default path collects it and runs union-find on the
   * driver — exact, one broadcast join, no iteration overhead. Graphs
   * bigger than `driverEdgeLimit` fall back to distributed min-label
   * propagation with pointer doubling (each round: one neighbor-min hop,
   * then label ← label-of-label), converging in O(log diameter) rounds,
   * with strict loop hygiene: every iterate is
   * `localCheckpoint`ed (truncated lineage — no plan-depth blowup across
   * iterations) and the superseded iterate's backing RDD is unpersisted
   * as soon as the next one is materialized, so storage stays O(1) in the
   * iteration count.
   */
  def connectedComponents(pairs: DataFrame, maxIterations: Int = 10,
                          driverEdgeLimit: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    pairs.cache() // count() + collect()/reuse below must not recompute the
                  // whole LSH/verify pipeline twice
    val nEdges = pairs.count()
    if (nEdges <= driverEdgeLimit) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      pairs.unpersist(false)
      val resolved = parent.keys.map(k => (k, find(k))).toSeq
      import spark.implicits._
      broadcast(resolved.toDF("node", "label"))
    } else {
      // localCheckpoint (eager) materializes AND truncates lineage; the
      // LogicalRDD backing lets us release the superseded iterate
      // deterministically instead of waiting for GC-driven cleanup.
      import org.apache.spark.sql.execution.LogicalRDD
      def backingRdd(d: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
        d.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }
      val edges = pairs.unionByName(
        pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .localCheckpoint()
      pairs.unpersist(false) // edges checkpoint holds the data now
      var ls = edges.select(col("doc_a").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
        .localCheckpoint()
      var converged = false
      var i = 0
      while (!converged && i < maxIterations) {
        // one neighbor-min step (propagates labels one hop)...
        val neighborMin = edges
          .join(ls, edges("doc_b") === ls("node"))
          .groupBy(col("doc_a").as("node0"))
          .agg(min(col("label")).as("nmin"))
        val stepped = ls.join(neighborMin, ls("node") === col("node0"), "left")
          .select(col("node"), least(col("label"),
            coalesce(col("nmin"), col("label"))).as("label"))
          .localCheckpoint() // both sides of the shortcut self-join below
                             // must read ONE materialization
        // ...then pointer doubling (label ← label-of-label): the reach
        // roughly doubles every round, d_{k+1} = 2(d_k + 1), so a path of
        // diameter D converges in ~log2(D) rounds instead of D — a
        // component's diameter exceeding maxIterations can no longer
        // yield partial labels for any graph of plausible size
        // (10 rounds cover diameter ≈ 2000).
        val next = stepped.alias("a")
          .join(stepped.select(col("node").as("__ln"),
            col("label").as("__ll")).alias("b"),
            col("a.label") === col("__ln"), "left")
          .select(col("a.node").as("node"), least(col("a.label"),
            coalesce(col("__ll"), col("a.label"))).as("label"))
          .localCheckpoint() // eager: materialized before the old ls goes away
        val changed = next.alias("n").join(ls.alias("o"), "node")
          .filter(col("n.label") =!= col("o.label")).limit(1).count()
        backingRdd(stepped).foreach(_.unpersist(false))
        backingRdd(ls).foreach(_.unpersist(false))
        ls = next
        converged = changed == 0
        i += 1
      }
      backingRdd(edges).foreach(_.unpersist(false))
      if (!converged)
        System.err.println(
          s"[graft] connectedComponents: label propagation did not converge " +
            s"in $maxIterations doubling iterations — a component with " +
            s"diameter > ~2^$maxIterations exists and its cluster ids are " +
            "PARTIAL; raise maxIterations")
      ls
    }
  }

  /**
   * Exact n-gram-Jaccard near-dup pairs via an inverted shingle index.
   * Candidate generation joins on 28-bit shingle hashes (8-byte shuffle
   * keys instead of shingle strings; a rare hash collision can only ADD a
   * candidate, never lose one); the final Jaccard is computed exactly
   * from the full shingle sets of each candidate pair.
   */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   minJaccard: Double = 0.8, minShared: Int = 2): DataFrame =
    verifiedPairs(df, idCol, textCol, minShared) { (sa, sb) =>
      size(array_intersect(sa, sb)).cast("double") /
        size(array_union(sa, sb))
    } { (c, na, nb) =>
      // c counts hash matches WITH multiplicity, so within-doc 28-bit
      // collisions can push it past min(na, nb) — at c = na + nb the raw
      // bound's denominator hits zero (ANSI: DIVIDE_BY_ZERO kills the
      // job; non-ANSI: the pair silently drops despite exact jac 1.0).
      // Clamping to min(na, nb) keeps the UPPER-BOUND invariant airtight:
      // exact |A∩B| <= min(na, nb) and x/(na+nb-x) is increasing, so the
      // clamped bound still dominates the exact score, and the
      // denominator is >= max(na, nb) >= 1. When c <= min(na, nb) — every
      // non-collision case — the clamp is the identity.
      val cEff = least(c, least(na, nb))
      cEff.cast("double") / (na + nb - cEff)
    }("jac", minJaccard)

  /**
   * N-gram CONTAINMENT near-dup pairs: score = |A∩B| / min(|A|,|B|).
   * Catches subset duplication — a document embedded in (or truncated
   * from) a longer one scores ~1.0 here while its Jaccard can be
   * arbitrarily low, so [[ngramJaccard]] never sees it. Same inverted
   * shingle index and candidates-only verify as the Jaccard path.
   */
  def ngramContainment(df: DataFrame, idCol: String, textCol: String,
                       minContainment: Double = 0.9,
                       minShared: Int = 2): DataFrame =
    verifiedPairs(df, idCol, textCol, minShared) { (sa, sb) =>
      size(array_intersect(sa, sb)).cast("double") /
        least(size(sa), size(sb))
    } { (c, na, nb) =>
      c.cast("double") / least(na, nb)
    }("containment", minContainment)

  /**
   * The 100 TB shape of [[ngramJaccard]]: Jaccard computed ENTIRELY from
   * the 60-bit inverted index — intersection = shared-hash count per
   * pair, set sizes = per-doc hash counts — so no document's shingle
   * array is ever fetched or shuffled (the exact-verify path still ships
   * every candidate pair's full sets through two joins). The checksum
   * family's precedent applies: [[ngramJaccard]] is the string-exact
   * anchor, this is the scale variant, and both are oracle-checked.
   * At 60 bits a collision (which could only nudge one pair's count by
   * one) has probability ~|A|·|B|/2^60 per pair — vanishing at any
   * realistic shingle-set size.
   */
  def ngramJaccardByHash(df: DataFrame, idCol: String, textCol: String,
                         minJaccard: Double = 0.8,
                         minShared: Int = 2): DataFrame =
    hashPairCounts(df, idCol, textCol, minShared)
      .withColumn("jac", col("__ce").cast("double") /
        (col("__na") + col("__nb") - col("__ce")))
      .filter(col("jac") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jac"))

  /** [[ngramContainment]]'s index-only scale variant; see
    * [[ngramJaccardByHash]]. */
  def ngramContainmentByHash(df: DataFrame, idCol: String, textCol: String,
                             minContainment: Double = 0.9,
                             minShared: Int = 2): DataFrame =
    hashPairCounts(df, idCol, textCol, minShared)
      .withColumn("containment", col("__ce").cast("double") /
        least(col("__na"), col("__nb")))
      .filter(col("containment") >= minContainment)
      .select(col("doc_a"), col("doc_b"), col("containment"))

  /** Pair (doc_a, doc_b, __c=|A∩B|, __na=|A|, __nb=|B|, __ce) from the
    * 60-bit inverted index alone — hash counts stand in for set
    * arithmetic. `__ce` is the COLLISION-SAFE intersection both score
    * variants must use: `__c` counts hash-join matches with
    * multiplicity, so a (vanishing at 60 bits, but possible) within-doc
    * collision can push it past min(na, nb) — at c = na + nb the
    * Jaccard denominator hits zero (ANSI kills the job) and containment
    * would report > 1.0, both impossible for the exact anchors. Clamped
    * to min(na, nb) the Jaccard denominator is >= max(na, nb) >= 1;
    * below that ceiling — every real case — the clamp is the identity.
    * Emitted HERE so the two consumers cannot drift. */
  private def hashPairCounts(df: DataFrame, idCol: String, textCol: String,
                             minShared: Int): DataFrame = {
    // the index feeds the per-doc sizes AND both sides of the self-join
    // (no cross-branch CSE in Spark) — checkpoint once. ShingleHash.h60
    // == explode(shingles)→hash60 elementwise (bit-parity proven by
    // Round9ShingleProperties + the full oracle run) but never
    // materializes a shingle string
    val inv = df.select(col(idCol),
        explode(ShingleHash.h60(col(textCol))).as("h"))
      .localCheckpoint(false)
    val sizes = inv.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    inv.select(col(idCol).as("doc_a"), col("h"))
      .join(inv.select(col(idCol).as("doc_b"), col("h")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minShared)
      .join(sizes.select(col(idCol).as("doc_a"), col("__n").as("__na")), "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col("__n").as("__nb")), "doc_b")
      .withColumn("__ce", least(col("__c"), col("__na"), col("__nb")))
  }

  /** Shared inverted-index candidate generation + exact verify on the full
    * shingle sets; `score` computes the verify metric from (setA, setB). */
  /**
   * Candidates → hash-bound prefilter → exact string verify.
   *
   * `score(setA, setB)` computes the exact verify metric from the full
   * shingle STRING sets (the string-exact anchor the oracles mirror).
   * `bound(c, na, nb)` computes the SAME metric from the 28-bit index
   * alone — shared-hash count `c` and per-doc hash counts `na`/`nb` —
   * and must be an UPPER BOUND on the exact score. That holds for both
   * callers by construction: a shared shingle string always shares its
   * hash (so c ≥ |A∩B|), a 28-bit collision can only ADD to c, and
   * na/nb equal |A|/|B| exactly ([[ShingleHash]] emits one hash per
   * DISTINCT string, collisions included). With bound ≥ exact, filtering
   * candidates at `minScore` on the bound BEFORE fetching string sets
   * drops no pair the exact verify could keep — the output is
   * bit-identical to verifying every candidate — while the verify joins
   * ship string arrays only for near-threshold pairs (measured at
   * sf0.1: 113k candidate pairs → ~500 survivors).
   *
   * INPUT DETERMINISM: `df` is evaluated twice — once for the hash
   * index (candidates), once for the surviving ids' string sets (the
   * verify). Re-checkpointing the corpus TEXT just to fuse the two
   * reads would materialize the whole input (the round-8 shape this
   * replaced stored the strictly larger shingle-string arrays); every
   * caller passes a deterministic parquet/fixture-backed frame, where
   * the two evaluations are identical by construction. A
   * nondeterministic source (rand()-derived ids, an uncheckpointed
   * sample) must be checkpointed BY THE CALLER first.
   */
  private def verifiedPairs(df: DataFrame, idCol: String, textCol: String,
                            minShared: Int)(
      score: (Column, Column) => Column)(
      bound: (Column, Column, Column) => Column)(
      scoreName: String, minScore: Double): DataFrame = {
    // Candidate generation hashes shingle byte-slices NATIVELY
    // ([[ShingleHash]] == explode(shingles)→hash28 elementwise, proven
    // by Round9ShingleProperties + the full oracle run): no corpus-wide
    // shingle-STRING arrays are built or checkpointed any more — the
    // round-8 shape materialized every document's full string shingle
    // set (~n× the token volume) just to feed the inverted index, then
    // kept it alive for the verify joins. Checkpointed (id, long) rows:
    // the index feeds both self-join sides AND the per-doc sizes, and
    // Spark has no cross-branch CSE.
    val inv = df.select(col(idCol),
      explode(ShingleHash.h28(col(textCol))).as("h"))
      .localCheckpoint(false)
    val sizes = inv.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    // candidate generation + bound prefilter run once (checkpoint): the
    // result feeds BOTH the id prune below and the final verify join.
    // The sizes joins are UNHINTED: sizes is one short row per corpus
    // doc — corpus-proportional, so a forced broadcast() would ship the
    // whole corpus's id space through the driver to every executor at
    // 100 TB. AQE broadcasts it when (and only when) it actually fits.
    val cand = inv.select(col(idCol).as("doc_a"), col("h"))
      .join(inv.select(col(idCol).as("doc_b"), col("h")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter_approx"))
      .filter(col("inter_approx") >= minShared)
      .join(sizes.select(col(idCol).as("doc_a"),
        col("__n").as("__na")), "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"),
        col("__n").as("__nb")), "doc_b")
      .filter(bound(col("inter_approx"), col("__na"), col("__nb"))
        >= minScore)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(false)
    val candIds = cand.select(col("doc_a").as(idCol))
      .union(cand.select(col("doc_b").as(idCol))).distinct()
    // exact verify compares full shingle STRING sets — built only here,
    // only for bound-surviving ids; checkpointed because both verify
    // joins read them
    val candSets = df.join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol), TextFns.shingles(col(textCol)).as("sset"))
      .localCheckpoint(false)
    cand
      .join(candSets.select(col(idCol).as("doc_a"), col("sset").as("sa")), "doc_a")
      .join(candSets.select(col(idCol).as("doc_b"), col("sset").as("sb")), "doc_b")
      .withColumn(scoreName, score(col("sa"), col("sb")))
      .filter(col(scoreName) >= minScore)
      .select(col("doc_a"), col("doc_b"), col(scoreName))
  }

  /**
   * Incremental cross-corpus dedup — the batch form of admitting a NEW
   * batch of documents against an EXISTING corpus (the operator an
   * ever-growing training corpus runs on every ingest; the streaming
   * greedy form is [[graft.streaming.StreamOps.nearDupDedupTo]]).
   *
   * Every new document gets a verdict row: its BEST corpus near-dup
   * (highest Jaccard, ties to the lower corpus id) when one clears
   * `minJaccard`, else admitted. Candidates come from a MinHash band-key
   * join between the two corpora — new×corpus pairs never materialize
   * beyond shared LSH buckets — and the best match reduces through the
   * bounded [[TopKAgg]] (k=1), so no per-doc sort or full match list.
   *
   * Returns (idCol, dup_of, jac, admitted).
   */
  def dedupAgainst(newDocs: DataFrame, corpus: DataFrame, idCol: String,
                   textCol: String, minJaccard: Double = 0.8): DataFrame = {
    TopKAgg.requireIntegralId(corpus, idCol, "dedupAgainst")
    val cSets = shingleSets(corpus, idCol, textCol).localCheckpoint(false)
    dedupAgainstFrom(newDocs, bandKeysFromSets(cSets, idCol), cSets,
      idCol, textCol, minJaccard)
  }

  /**
   * Persist the cross-corpus dedup index for build-once / probe-many
   * ingest ([[buildIvfIndex]]'s text analogue): every ingest batch
   * otherwise re-shingles, re-hashes, and re-minhashes the ENTIRE
   * admitted corpus — the dominant cost, linear in corpus size, paid
   * per batch. This writes the corpus's band keys (`path/keys`) and
   * shingle sets (`path/sets`) once; [[dedupAgainstIndexed]] then costs
   * only the batch's own shingling plus the bucket-local joins.
   * (The streaming form, [[graft.streaming.StreamOps.nearDupDedupTo]],
   * maintains the same two tables incrementally as its state.)
   */
  def buildDedupIndex(corpus: DataFrame, idCol: String, textCol: String,
                      path: String): Unit = {
    TopKAgg.requireIntegralId(corpus, idCol, "buildDedupIndex")
    // EAGER checkpoint: shingling (the corpus-sized cost) runs exactly
    // once, and the two table writes below — independent reads of the
    // materialized sets — overlap instead of serializing (the
    // buildIvfIndex inParallel device; a lazy checkpoint would let the
    // concurrent first actions race its materialization). Crash shape
    // is unchanged: no marker gates the batch build, a half-landed
    // index was inconsistent under either write order, and a re-run
    // overwrites both tables.
    val cSets = shingleSets(corpus, idCol, textCol).localCheckpoint(true)
    Similarity.inParallel(
      () => cSets.write.mode("overwrite").parquet(s"$path/sets"),
      () => bandKeysFromSets(cSets, idCol)
        .write.mode("overwrite").parquet(s"$path/keys"))
    // a flat rebuild over a formerly-partitioned path must also retire
    // the layout marker (else every later probe takes the wrong path),
    // any append deltas, and the schema memo the new shape invalidates
    clearDedupLayout(corpus.sparkSession, path)
    deleteDeltas(corpus.sparkSession, path)
    invalidateSchemas(path)
  }

  // ---- partition-prunable persisted index (the 100 TB layout) ----------

  /** The banded-index layout parameters, recorded in the marker:
    * `setBuckets` id buckets for the sets table, `bpChars` md5-hex chars
    * of band-prefix for the keys table (1 → 16 dirs, 2 → 256). Fewer
    * dirs = less per-probe file listing/planning (measured ~2 ms per
    * file in local mode — the dominant term of the banded probe's fixed
    * cost at small corpora); more dirs = finer IO pruning for tiny
    * batches at huge corpora. Markers written before round 11 carry
    * only `setBuckets` and read as `bpChars = 2` (their on-disk
    * layout). */
  private[graft] case class BandedLayout(setBuckets: Int, bpChars: Int) {
    require(setBuckets > 0, s"setBuckets must be positive: $setBuckets")
    require(bpChars == 1 || bpChars == 2, s"bpChars must be 1 or 2: $bpChars")
    def bpDirs: Int = 1 << (4 * bpChars)
  }

  /** Scale-adaptive band-prefix width: 16 dirs under ~half a million
    * docs (the fixed per-dir cost dominates any pruning there), 256
    * beyond (a tiny probe against a 100 TB corpus should read 1/256th
    * of the key tree, not 1/16th). */
  private[graft] def autoBpChars(nDocs: Long): Int =
    if (nDocs < 500000L) 1 else 2

  /** Partition value for a band key: its first 1-2 md5-hex chars,
    * prefixed `x` so parquet partition-value inference can never type a
    * digit-only sample as integer. Derived from the key, so batch and
    * corpus sides always agree. */
  private[graft] def bandPrefix(bkey: Column, bpChars: Int = 2): Column =
    concat(lit("x"), substring(bkey, 1, bpChars))

  /** Partition value for a corpus id in the `sets` table. */
  private[graft] def idBucket(id: Column, setBuckets: Int): Column =
    pmod(id.cast("long"), lit(setBuckets.toLong)).cast("int")

  /** THE banded sets-table write shape — bucket column + task routing in
    * one place: every writer (batch build, batch append, streamed ingest
    * epochs) must agree bit-for-bit with the probe's partition filters
    * or pruning silently misses rows. Returns the frame ready for
    * `.write...partitionBy("ib")`. */
  private[graft] def bandedSets(sets: DataFrame, idCol: String,
                                setBuckets: Int): DataFrame =
    sets.withColumn("ib", idBucket(col(idCol), setBuckets))
      .repartition(writeTasks(sets, setBuckets), col("ib"))

  /** The banded keys-table twin (band-prefix dirs). */
  private[graft] def bandedKeys(keys: DataFrame,
                                bpChars: Int = 2): DataFrame =
    keys.withColumn("bp", bandPrefix(col("bkey"), bpChars))
      .repartition(writeTasks(keys, 1 << (4 * bpChars)), col("bp"))

  /** Shuffle-task count for a dir-partitioned index write: one task per
    * dir where the cluster has the cores (`dirs`, the layout's natural
    * width), the core count where it does not. Keying the hash
    * repartition wider than the cluster only queues task-commit waves
    * (a fixed 256 on a 32-core box is ~8 commit waves of pure latency),
    * while fewer tasks write the SAME one file per touched dir through
    * the sorted dynamic-partition writer. Dir COUNT and dir VALUES are
    * the partition column's alone — probe pruning is unaffected. */
  private[graft] def writeTasks(df: DataFrame, dirs: Int): Int =
    math.max(1, math.min(dirs,
      df.sparkSession.sparkContext.defaultParallelism))

  private[graft] def layoutMarkerPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_graft_dedup_layout")

  /** The [[BandedLayout]] from the layout marker, if the index at `path`
    * was built partitioned. Flat indexes (no marker) return None. A
    * marker that exists but cannot be parsed — including a bare number
    * from a truncated or foreign write — is CORRUPT and fails loudly
    * rather than silently probing a partitioned tree as flat (which
    * would read the whole index and, worse, hide layout drift). Shared
    * format/atomicity machinery: [[LayoutMarker]]; pre-round-11 markers
    * carry only the bucket count and read as the 256-dir key layout
    * they were written with. */
  private[graft] def readDedupLayout(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[BandedLayout] = {
    val p = layoutMarkerPath(path)
    LayoutMarker.readFields(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration),
      p, "banded|", "dedup-index").map {
      case Seq(b) => BandedLayout(b, 2)
      case Seq(b, c) => BandedLayout(b, c)
      case other => sys.error(
        s"corrupt dedup-index layout marker at $p: ${other.size} fields")
    }
  }

  /** Remove the layout marker (flat rebuild over a formerly-partitioned
    * path): without this the stale marker would route every later probe
    * and append down the partitioned path against flat files. */
  private def clearDedupLayout(spark: org.apache.spark.sql.SparkSession,
                               path: String): Unit = {
    val p = layoutMarkerPath(path)
    LayoutMarker.delete(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private[graft] def writeDedupLayout(
      spark: org.apache.spark.sql.SparkSession,
      path: String, layout: BandedLayout): Unit = {
    val p = layoutMarkerPath(path)
    LayoutMarker.writeFields(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p,
      "banded|", Seq(layout.setBuckets, layout.bpChars))
  }

  /**
   * [[buildDedupIndex]] in the PARTITION-PRUNABLE layout — the 100 TB
   * form. The flat layout forces every probe (and the streaming
   * [[graft.streaming.StreamOps.crossDedupTo]]) to scan — or pin in
   * executor storage — the WHOLE corpus index, O(corpus) per stream; the
   * IVF text analogue ([[Similarity.buildIvfIndex]]'s `__cellkey` dirs)
   * instead prunes each probe to its own cells. This applies the same
   * device to text dedup:
   *
   *  - `keys` is partitioned by `bp` = [[bandPrefix]] (256 dirs): a probe
   *    batch's band keys hash uniformly (md5), so a batch touches only
   *    the prefixes it actually has — a small batch reads a small
   *    fraction of the key tree, and NOTHING is pinned across batches.
   *  - `sets` is partitioned by `ib` = id mod `setBuckets`: the verify
   *    step needs only the CANDIDATE corpus docs' shingle sets, and
   *    candidates are few after banding (the sets tree is the bulky
   *    table — full shingle arrays — so this is where pruning pays
   *    most).
   *
   * Results are bit-identical to the flat layout: pruning removes only
   * partitions that cannot hold a matching band key / candidate id, and
   * the verify core is shared ([[verifyBest]]). `setBuckets` bounds the
   * per-probe partition-filter list (collected driver-side, ≤ setBuckets
   * values) — raise it for huge corpora so each `sets` bucket stays
   * executor-sized (e.g. 4096 at 100 TB keeps buckets ~25 GB and the
   * filter list still trivially small).
   *
   * A one-line layout marker (`_graft_dedup_layout`) records the bucket
   * count; [[dedupAgainstIndexed]], [[appendToDedupIndex]] and
   * [[compactDedupIndex]] sniff it and pick the matching code path, so
   * callers use one API for both layouts. Keep the flat builder for
   * small corpora: below ~a few hundred MB the partition dirs cost more
   * (listing, small files) than the pruning saves.
   */
  def buildDedupIndexPartitioned(corpus: DataFrame, idCol: String,
                                 textCol: String, path: String,
                                 setBuckets: Int = 64,
                                 bpChars: Int = -1): Unit = {
    TopKAgg.requireIntegralId(corpus, idCol, "buildDedupIndexPartitioned")
    require(setBuckets > 0, s"setBuckets must be positive: $setBuckets")
    val spark = corpus.sparkSession
    // EAGER checkpoint — see buildDedupIndex: one shingling pass, then
    // the two independent partitioned writes overlap
    val cSets = shingleSets(corpus, idCol, textCol).localCheckpoint(true)
    // band-prefix width: explicit, or scale-adaptive from the corpus
    // size (the count is one cheap job over the checkpointed sets)
    val layout = BandedLayout(setBuckets,
      if (bpChars > 0) bpChars else autoBpChars(cSets.count()))
    // [[bandedSets]]/[[bandedKeys]]: partition-column + capped task
    // routing in one shared definition (each dir written by exactly the
    // tasks owning its key — no file-per-task-per-key explosion, no
    // empty shuffle tasks beyond the bucket count)
    Similarity.inParallel(
      () => bandedSets(cSets, idCol, setBuckets)
        .write.mode("overwrite").partitionBy("ib").parquet(s"$path/sets"),
      () => bandedKeys(bandKeysFromSets(cSets, idCol), layout.bpChars)
        .write.mode("overwrite").partitionBy("bp").parquet(s"$path/keys"))
    // a rebuild over an append-grown path must also retire the deltas
    // (their rows are re-derived from the new corpus or gone for good)
    // and the schema memo (a formerly-flat path gains partition columns)
    deleteDeltas(spark, path)
    invalidateSchemas(path)
    writeDedupLayout(spark, path, layout)
  }

  private[graft] def deltaPaths(path: String): Seq[String] =
    Seq(s"$path/sets_delta", s"$path/keys_delta")

  private def deleteDeltas(spark: org.apache.spark.sql.SparkSession,
                           path: String): Unit =
    deltaPaths(path).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) { fs.delete(p, true); () }
    }

  /**
   * Migrate a FLAT [[buildDedupIndex]] tree to the partitioned layout
   * IN PLACE, without re-shingling the corpus — the index tables already
   * hold everything the banded layout needs (shingling is the dominant
   * build cost; this pays only two table rewrites). Crash-safe at every
   * window by ordering: both tables are rewritten via
   * [[ParquetCompact]]'s staged swap (its recover() heals a mid-swap
   * crash on the next call), and the marker lands LAST — a flat read of
   * an already-banded tree is harmless (the partition columns are
   * additive and the probe selects by name), while a banded read of a
   * still-flat tree would crash, so no window ever takes the banded
   * path early. Single-writer discipline: no probe/append in flight.
   *
   * Not for epoch-partitioned ingest trees
   * ([[graft.streaming.StreamOps.dedupIngestTo]]) — their epoch dirs
   * nest differently; bootstrap those banded from the start
   * (`dedupIngestBootstrapPartitioned`).
   *
   * RE-RUNNABLE AFTER A CRASH at any window, in two layers: first,
   * [[ParquetCompact.recoverTable]] runs on both tables BEFORE the
   * precondition reads (a crash mid-sets-swap leaves `$path/sets`
   * renamed away, so the precondition's read would throw path-not-found
   * before compactVia's own recovery could roll it back); second, the
   * half-migrated shapes a crash BETWEEN the steps leaves (sets already
   * banded + keys still flat: crash after the sets rewrite; both banded
   * + marker absent: crash before the marker write) are detected and
   * RESUMED from the first incomplete step instead of refused — the
   * pre-resume flat-shape check would otherwise fail with a misleading
   * "not a flat dedup index" error and leave the migration stuck until
   * manual filesystem surgery. A resume verifies the on-disk `ib`
   * bucketing matches `setBuckets` (one column-pruned scan, no shuffle)
   * so a re-run with a DIFFERENT bucket count fails loudly rather than
   * stamping a marker the data contradicts.
   *
   * Returns per-table row counts.
   */
  def migrateToPartitionedIndex(spark: org.apache.spark.sql.SparkSession,
                                path: String,
                                setBuckets: Int = 64): Map[String, Long] = {
    require(setBuckets > 0, s"setBuckets must be positive: $setBuckets")
    require(readDedupLayout(spark, path).isEmpty,
      s"index at $path is already partitioned")
    ParquetCompact.recoverTable(spark, s"$path/sets")
    ParquetCompact.recoverTable(spark, s"$path/keys")
    val setsCols = spark.read.parquet(s"$path/sets").columns
    val keysCols = spark.read.parquet(s"$path/keys").columns
    val setsBanded = setsCols.contains("ib")
    val keysBanded = keysCols.contains("bp")
    require(setsBanded || !keysBanded,
      s"index at $path has banded keys over flat sets — not a shape this " +
        "migration (sets first, then keys) can produce; rebuild the index")
    require(setsCols.contains("sset") &&
      (if (setsBanded) setsCols.length == 3 else setsCols.length == 2),
      s"not a flat dedup index (sets columns: ${setsCols.mkString(",")}) " +
        "— epoch-partitioned ingest trees cannot be migrated in place")
    val idCol = setsCols.filterNot(c => c == "sset" || c == "ib").head
    val nSets =
      if (!setsBanded)
        ParquetCompact.rewritePartitioned(spark, s"$path/sets",
          "ib")(df => bandedSets(df, idCol, setBuckets))
      else {
        // resume: the crashed attempt's buckets must match this run's
        val sets = spark.read.parquet(s"$path/sets")
        require(sets.filter(idBucket(col(idCol), setBuckets) =!= col("ib"))
          .isEmpty,
          s"half-migrated sets at $path were bucketed with a different " +
            s"setBuckets than $setBuckets — resume with the original count")
        sets.count()
      }
    val bpChars =
      if (keysBanded) {
        // resume: the marker must record the width the crashed attempt
        // actually wrote (bp = 'x' + that many hex chars)
        val w = spark.read.parquet(s"$path/keys")
          .select(length(col("bp"))).limit(1).collect().headOption
          .map(_.getInt(0) - 1)
          .getOrElse(throw new IllegalStateException(
            s"half-migrated keys table at $path/keys is banded but empty " +
              "— its bp width cannot be recovered; rebuild the index"))
        require(w == 1 || w == 2,
          s"half-migrated keys at $path carry bp width $w")
        w
      } else autoBpChars(nSets) // one row per doc — already counted
    val nKeys =
      if (!keysBanded)
        ParquetCompact.rewritePartitioned(spark, s"$path/keys",
          "bp")(df => bandedKeys(df, bpChars))
      else spark.read.parquet(s"$path/keys").count()
    invalidateSchemas(path) // flat → banded changes both table shapes
    writeDedupLayout(spark, path, BandedLayout(setBuckets, bpChars))
    Map("sets" -> nSets, "keys" -> nKeys)
  }

  /** Driver-side row bound for the probe's local-relation fast path:
    * batch band keys and candidate pairs up to this many rows are
    * collected into broadcast LocalRelations (each saves a
    * localCheckpoint job + a separate distinct-collect job); beyond it
    * the probe falls back to the fully distributed shape. ~25 MB of
    * rows at the cap — the same order as the other bounded collects. */
  private val MaxProbeRows = 262144

  /** Per-JVM memo of an index table's read schema: a frozen index's
    * schema cannot change (the frozen-index contract every probe-many
    * caller already relies on), and per-probe inference costs a listing
    * + footer read — which streaming probes would pay every
    * micro-batch. */
  private val indexSchemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()
  private def tableSchema(spark: org.apache.spark.sql.SparkSession,
                          root: String) =
    indexSchemaCache.computeIfAbsent(root,
      _ => spark.read.parquet(root).schema)

  /** Drop the memoized schemas under `path` — every REBUILD of an index
    * (and the flat→banded migration) can change the table shape, and a
    * stale memo would silently misread the new files. */
  private def invalidateSchemas(path: String): Unit = {
    val it = indexSchemaCache.keySet().iterator()
    while (it.hasNext) if (it.next().startsWith(path)) it.remove()
  }

  /** Read selected `prefix=value` partition dirs of a banded table as
    * explicit paths (skips listing/planning every other dir — the
    * measured fixed cost of the banded probe is ~2 ms per FILE in the
    * table, so reading 3 candidate dirs instead of 64 is the win), with
    * the schema served from the per-JVM memo. `values` are the wanted
    * partition values (dir-name suffixes); dirs that do not exist are
    * simply absent from the listing. */
  private def readBandedDirs(spark: org.apache.spark.sql.SparkSession,
                             root: String, partCol: String,
                             values: Option[Set[String]]): DataFrame = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the batch-built layout puts `partCol=` dirs at the first level;
    // the streamed ingest layout ([[graft.streaming.StreamOps
    // .dedupIngestTo]]) nests them one level down inside `__batch=N`
    // epoch dirs — descend one partition level to find them (metadata
    // listings only), so both layouts prune identically
    def level(dirs: Seq[org.apache.hadoop.fs.Path])
        : Seq[org.apache.hadoop.fs.Path] =
      dirs.flatMap(d => fs.listStatus(d).toSeq.map(_.getPath)
        .filter(p => p.getName.contains("=")))
    val first =
      if (!fs.exists(rootPath)) Seq.empty else level(Seq(rootPath))
    val leaves =
      if (first.exists(_.getName.startsWith(s"$partCol="))) first
      else level(first)
    val wanted = leaves.filter(_.getName.startsWith(s"$partCol="))
      .filter(p => values.forall(_.contains(
        p.getName.stripPrefix(s"$partCol="))))
    val schema = tableSchema(spark, root)
    if (wanted.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).option("basePath", root)
      .parquet(wanted.map(_.toString): _*)
  }

  /** A delta table's rows, or an empty frame of the base columns when no
    * delta exists ([[appendToDedupIndex]] writes appends FLAT into
    * `sets_delta`/`keys_delta`; probes union them in, compaction folds
    * them into the banded base). */
  private def deltaOrEmpty(spark: org.apache.spark.sql.SparkSession,
                           deltaPath: String,
                           like: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(deltaPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // existence alone is not readability: a crashed FIRST append leaves
    // the dir holding only `_temporary`, and schema inference over zero
    // data files throws — wedging every later probe until a successful
    // re-append. Same crash window [[stateOrEmpty]] guards streaming-side.
    if (hasDataFiles(fs, p)) spark.read.schema(tableSchema(spark, deltaPath))
      .parquet(deltaPath)
    else like.limit(0)
  }

  /** Whether `p` holds at least one non-hidden file (deltas write flat, so
    * data files sit directly under the dir; `_temporary`/`_SUCCESS` don't
    * count). */
  private def hasDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                           p: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(p) && fs.listStatus(p).exists(s => s.isFile && {
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    })

  /**
   * Probe of the partitioned layout. The batch's band keys (ONE bounded
   * collect) become driver-side partition-dir selections AND a
   * broadcast LocalRelation for the candidate join; the candidates
   * (second bounded collect) select the sets buckets the same way — so
   * the corpus trees are read only where this batch can possibly match,
   * from explicitly-listed dirs with a memoized schema. Four Spark jobs
   * total on the fast path (shingle checkpoint, key collect, candidate
   * collect, verify) vs six in the round-10 shape — the job count, not
   * the data, dominated the probe's fixed cost. A batch over the row
   * cap falls back to the distributed shape with the same semantics —
   * discarding the capped collect and recomputing from the checkpointed
   * shingles. That double work is deliberate: gating with a count()
   * first would add a job to EVERY small probe (the measured fixed
   * cost this shape exists to cut) to save one bounded ~25 MB collect
   * on the rare over-cap batch, which pays a large batch's cost anyway.
   *
   * `cap` overrides [[MaxProbeRows]] ONLY in specs: a tiny cap routes a
   * small batch through the over-cap branches (the wide probe, the
   * distributed candidate selection), whose equivalence would otherwise
   * need a ~65k-doc batch to reach. Production callers take the default.
   */
  private[graft] def dedupAgainstPartitioned(
      spark: org.apache.spark.sql.SparkSession, path: String,
      layout: BandedLayout, newDocs: DataFrame, idCol: String,
      textCol: String, minJaccard: Double,
      cap: Int = MaxProbeRows): DataFrame = {
    val nSets = shingleSets(newDocs, idCol, textCol).localCheckpoint(false)
    val nKeysDf = bandKeysFromSets(nSets, idCol)
    val nKeyRows = nKeysDf.limit(cap + 1).collect()
    val keysDelta = deltaOrEmpty(spark, s"$path/keys_delta", nKeysDf)
    if (nKeyRows.length > cap)
      return dedupAgainstPartitionedWide(spark, path, layout, newDocs,
        nSets, keysDelta, idCol, minJaccard)
    import scala.jdk.CollectionConverters._
    val localKeys = spark.createDataFrame(
      nKeyRows.toSeq.asJava, nKeysDf.schema)
    val bkeyAt = nKeysDf.schema.fieldIndex("bkey")
    val bps = nKeyRows.map(r =>
      "x" + r.getString(bkeyAt).substring(0, layout.bpChars)).toSet
    val cKeys = readBandedDirs(spark, s"$path/keys", "bp", Some(bps))
      .select(col(idCol), col("band"), col("bkey"))
      .unionByName(keysDelta.select(col(idCol), col("band"), col("bkey")))
    val cand0 = broadcast(localKeys)
      .join(cKeys.select(col(idCol).as("__cid"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .select(col(idCol), col("__cid")).distinct()
    val candRows = cand0.limit(cap + 1).collect()
    val setsDelta = deltaOrEmpty(spark, s"$path/sets_delta", nSets)
      .select(col(idCol), col("sset"))
    val (cand, cSets) =
      if (candRows.length > cap) {
        // candidate explosion (heavily duplicated corpus): distributed
        val c = cand0.localCheckpoint(false)
        val ibs = c.select(idBucket(col("__cid"), layout.setBuckets)
          .as("ib")).distinct().collect().map(_.getInt(0).toString).toSet
        (c, readBandedDirs(spark, s"$path/sets", "ib", Some(ibs))
          .select(col(idCol), col("sset")).unionByName(setsDelta))
      } else {
        val cidAt = cand0.schema.fieldIndex("__cid")
        // corpus ids may be any integral type on disk — go via Number
        val ibs = candRows.map(r => java.lang.Math.floorMod(
          r.get(cidAt).asInstanceOf[Number].longValue(),
          layout.setBuckets.toLong).toString).toSet
        (broadcast(spark.createDataFrame(candRows.toSeq.asJava,
          cand0.schema)),
          readBandedDirs(spark, s"$path/sets", "ib", Some(ibs))
            .select(col(idCol), col("sset")).unionByName(setsDelta))
      }
    verifyBest(newDocs, nSets, cand, cSets, idCol, minJaccard)
  }

  /** The distributed fallback for key batches past [[MaxProbeRows]] —
    * the round-10 probe shape (checkpointed keys, distinct-collected
    * partition filters), semantics identical. `private[graft]` so the
    * spec can drive it DIRECTLY on a small batch: reaching it through
    * the public probe needs >[[MaxProbeRows]] band keys (~65k docs),
    * which would leave the fallback's equivalence untested. */
  private[graft] def dedupAgainstPartitionedWide(
      spark: org.apache.spark.sql.SparkSession, path: String,
      layout: BandedLayout, newDocs: DataFrame, nSets: DataFrame,
      keysDelta: DataFrame, idCol: String, minJaccard: Double): DataFrame = {
    val nKeys = bandKeysFromSets(nSets, idCol).localCheckpoint(false)
    val bps = nKeys
      .select(bandPrefix(col("bkey"), layout.bpChars).as("bp")).distinct()
      .collect().map(_.getString(0)).toSet // bounded: ≤ bpDirs values
    val cKeys = readBandedDirs(spark, s"$path/keys", "bp", Some(bps))
      .select(col(idCol), col("band"), col("bkey"))
      .unionByName(keysDelta.select(col(idCol), col("band"), col("bkey")))
    val cand = nKeys
      .join(cKeys.select(col(idCol).as("__cid"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .select(col(idCol), col("__cid")).distinct()
      .localCheckpoint(false) // feeds the bucket collect AND the verify
    val ibs = cand.select(idBucket(col("__cid"), layout.setBuckets).as("ib"))
      .distinct().collect().map(_.getInt(0).toString).toSet
    val cSets = readBandedDirs(spark, s"$path/sets", "ib", Some(ibs))
      .select(col(idCol), col("sset"))
      .unionByName(deltaOrEmpty(spark, s"$path/sets_delta", nSets)
        .select(col(idCol), col("sset")))
    verifyBest(newDocs, nSets, cand, cSets, idCol, minJaccard)
  }

  /** Probe a persisted [[buildDedupIndex]] or
    * [[buildDedupIndexPartitioned]] (layout sniffed from the marker):
    * identical results to [[dedupAgainst]] on the same corpus (shared
    * candidate/verify core; band keys and shingle sets round-trip
    * exactly through parquet; the partitioned path only prunes
    * partitions that cannot match). */
  def dedupAgainstIndexed(spark: org.apache.spark.sql.SparkSession,
                          path: String, newDocs: DataFrame, idCol: String,
                          textCol: String,
                          minJaccard: Double = 0.8): DataFrame =
    readDedupLayout(spark, path) match {
      case Some(layout) =>
        dedupAgainstPartitioned(spark, path, layout, newDocs, idCol,
          textCol, minJaccard)
      case None =>
        dedupAgainstTables(newDocs, spark.read.parquet(s"$path/keys"),
          spark.read.parquet(s"$path/sets"), idCol, textCol, minJaccard)
    }

  /** [[dedupAgainstIndexed]] over ALREADY-LOADED index tables — for
    * callers that probe the same frozen index repeatedly (the streaming
    * cross-corpus dedup loads + materializes keys/sets once per query
    * instead of re-listing parquet every micro-batch). */
  def dedupAgainstTables(newDocs: DataFrame, cKeys: DataFrame,
                         cSets: DataFrame, idCol: String, textCol: String,
                         minJaccard: Double = 0.8): DataFrame =
    dedupAgainstFrom(newDocs, cKeys, cSets, idCol, textCol, minJaccard)

  /**
   * APPEND a batch to a persisted [[buildDedupIndex]] — the incremental
   * maintenance an ingest pipeline needs: admitting a batch into the
   * corpus must not rebuild the whole index (51.6 s at 100× vs the
   * batch's own shingling). Both index tables are per-doc independent
   * rows (a doc's shingle set and band keys depend on nothing else), so
   * appending the batch's rows IS the rebuild: append-then-probe is
   * bit-identical to rebuild-then-probe over the grown corpus
   * (Round7OpsSpec proves it). This is the batch twin of the streaming
   * state writes in [[graft.streaming.StreamOps.nearDupDedupTo]] — same
   * two tables, same row shapes, epochless.
   *
   * Caller contract: batch ids must be new (an id already indexed would
   * shadow itself as its own duplicate at probe time), and appends are
   * not concurrency-safe against a probe in flight on the same path —
   * same single-writer discipline as the streaming state.
   */
  def appendToDedupIndex(batch: DataFrame, idCol: String, textCol: String,
                         path: String): Unit = {
    TopKAgg.requireIntegralId(batch, idCol, "appendToDedupIndex")
    val bSets = shingleSets(batch, idCol, textCol).localCheckpoint(false)
    readDedupLayout(batch.sparkSession, path) match {
      case Some(_) =>
        // partitioned layout: the append lands FLAT in the delta tables
        // (`sets_delta`/`keys_delta`), NOT in the banded base — writing
        // a small batch across up to bpDirs+setBuckets partition dirs
        // cost ~10x the flat append at every measured scale and
        // accumulated a file per dir per append; a flat delta costs
        // exactly the flat append, probes union it in (its size is
        // bounded by the appends since the last compaction), and
        // [[compactDedupIndex]] folds it into the banded base. Rows are
        // identical either way, so append-then-probe ≡
        // rebuild-then-probe holds unchanged.
        bSets.coalesce(8).write.mode("append")
          .parquet(s"$path/sets_delta")
        bandKeysFromSets(bSets, idCol).coalesce(8).write.mode("append")
          .parquet(s"$path/keys_delta")
      case None =>
        bSets.write.mode("append").parquet(s"$path/sets")
        bandKeysFromSets(bSets, idCol)
          .write.mode("append").parquet(s"$path/keys")
    }
  }

  /** Compact an append-grown dedup index in place — flat tables to
    * ~`targetFiles` files, partitioned tables to one file per partition
    * dir (layout sniffed from the marker), FOLDING the flat append
    * deltas into the banded base (each table rewrites as
    * derive(base ∪ delta) through the crash-safe staged swap; the delta
    * dir is deleted after its swap commits, and the exact-duplicate
    * drop makes a crash between the two converge on the next run
    * instead of doubling rows for good). Returns per-table row
    * counts. */
  def compactDedupIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String,
                        targetFiles: Int = 8): Map[String, Long] =
    readDedupLayout(spark, path) match {
      case Some(layout) =>
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // roll back/forward a crashed PRIOR compaction before the
        // precondition reads below — a crash mid-swap renames `sets`
        // away, and reading it for idCol detection would throw
        // path-not-found before rewritePartitionedWith's own recovery
        // could run (the exact hazard [[migrateToPartitionedIndex]]
        // recovers against)
        ParquetCompact.recoverTable(spark, s"$path/sets")
        ParquetCompact.recoverTable(spark, s"$path/keys")
        def delta(p: String): Option[DataFrame] =
          if (hasDataFiles(fs, new org.apache.hadoop.fs.Path(p)))
            Some(spark.read.parquet(p))
          else None
        val idCol = spark.read.parquet(s"$path/sets").columns
          .filterNot(c => c == "sset" || c == "ib").head
        // EXACT-duplicate drop only ((id, sset), not by id): its purpose
        // is crash convergence (a delta folded but not yet deleted
        // re-folds identical rows), and an id that was — against the
        // append contract — re-appended with different text keeps BOTH
        // generations here just as the pre-compaction probe saw them;
        // a by-id drop could keep one generation's sset beside the
        // other generation's band keys and verify candidates against
        // the wrong shingles
        val nSets = ParquetCompact.rewritePartitionedWith(spark,
          s"$path/sets", "ib", delta(s"$path/sets_delta")) { df =>
          bandedSets(df.select(col(idCol), col("sset"))
            .dropDuplicates(idCol, "sset"), idCol, layout.setBuckets)
        }
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/sets_delta"), true)
        val nKeys = ParquetCompact.rewritePartitionedWith(spark,
          s"$path/keys", "bp", delta(s"$path/keys_delta")) { df =>
          bandedKeys(df.select(col(idCol), col("band"), col("bkey"))
            .dropDuplicates(idCol, "band", "bkey"), layout.bpChars)
        }
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/keys_delta"), true)
        Map("sets" -> nSets, "keys" -> nKeys)
      case None =>
        Seq("sets", "keys").map(t =>
          t -> ParquetCompact.table(spark, s"$path/$t", targetFiles)).toMap
    }

  /** Shared cross-corpus core over (corpus band keys, corpus shingle
    * sets): bucket-local candidates, exact-Jaccard verify, best match
    * per new doc. The batch side shingles once (checkpointed). */
  private def dedupAgainstFrom(newDocs: DataFrame, cKeys: DataFrame,
                               cSets: DataFrame, idCol: String,
                               textCol: String,
                               minJaccard: Double): DataFrame = {
    val nSets = shingleSets(newDocs, idCol, textCol).localCheckpoint(false)
    val nKeys = bandKeysFromSets(nSets, idCol)
    val cand = nKeys
      .join(cKeys.select(col(idCol).as("__cid"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .select(col(idCol), col("__cid")).distinct()
    verifyBest(newDocs, nSets, cand, cSets, idCol, minJaccard)
  }

  /** Exact-Jaccard verify + best-match reduce shared by the flat and
    * partition-pruned probe paths: identical inputs (candidate pairs,
    * batch shingle sets, corpus shingle sets) → identical verdict rows,
    * which is the bit-identity argument for the pruned layout (pruning
    * only removes partitions that cannot contain a candidate). */
  private def verifyBest(newDocs: DataFrame, nSets: DataFrame,
                         cand: DataFrame, cSets: DataFrame, idCol: String,
                         minJaccard: Double): DataFrame = {
    val best = cand
      .join(nSets, Seq(idCol))
      .join(cSets.select(col(idCol).as("__cid"), col("sset").as("__cs")),
        Seq("__cid"))
      .withColumn("jac",
        size(array_intersect(col("sset"), col("__cs"))).cast("double") /
          size(array_union(col("sset"), col("__cs"))))
      .filter(col("jac") >= minJaccard)
      .groupBy(col(idCol))
      .agg(TopKAgg(col("jac"), col("__cid").cast("long"), 1).as("__top"))
      .select(col(idCol),
        col("__top").getItem(0).getField("id").as("dup_of"),
        col("__top").getItem(0).getField("score").as("jac"))
    newDocs.select(col(idCol)).join(best, Seq(idCol), "left")
      .withColumn("admitted", col("dup_of").isNull)
  }

  /**
   * Benchmark decontamination — the pass a training pipeline runs so its
   * corpus does not contain the evaluation sets: every TRAIN document is
   * scored by the fraction of its shingles that appear anywhere in the
   * BENCHMARK corpus' shingle universe (GPT-3-style n-gram overlap
   * filtering). Here the benchmark side is a deterministic hash sample of
   * the same table so oracles can reproduce it; in production it is the
   * held-out eval suite.
   *
   * Scale shape: the benchmark n-gram universe is tiny relative to a
   * 100 TB corpus (eval suites are fixed-size) — it broadcasts, so the
   * train side never shuffles its shingles: one scan, a broadcast-hash
   * probe per shingle, and a map-side-combinable count per document.
   * Documents with fewer than 3 words have no shingles and drop out
   * (nothing to test overlap on) — same on the oracle side.
   *
   * Returns (idCol, n_shingles, n_overlap, overlap_frac, contaminated).
   */
  def decontaminate(df: DataFrame, idCol: String, textCol: String,
                    benchPct: Int = 10,
                    maxOverlapFrac: Double = 0.5): DataFrame = {
    require(benchPct >= 0 && benchPct <= 100, s"benchPct=$benchPct")
    val isBench =
      pmod(Md5Prefix28(col(idCol).cast("string")), lit(100L)) < benchPct
    decontaminateAgainst(
      df.filter(!isBench), df.filter(isBench), idCol, textCol, maxOverlapFrac)
  }

  /** [[decontaminate]] with an explicit benchmark corpus — the production
    * form: the eval suites live in their own table, not a sample of the
    * training corpus. Same broadcast shingle-universe shape. */
  /** The distinct 28-bit shingle-hash universe of a (benchmark) corpus —
    * the broadcast side of decontamination. Small by construction: eval
    * suites are fixed-size regardless of corpus scale. */
  def shingleUniverse(bench: DataFrame, textCol: String): DataFrame =
    bench.select(explode(ShingleHash.h28(col(textCol))).as("h")).distinct()

  def decontaminateAgainst(train: DataFrame, bench: DataFrame, idCol: String,
                           textCol: String,
                           maxOverlapFrac: Double = 0.5): DataFrame =
    decontaminateAgainstUniverse(train, shingleUniverse(bench, textCol),
      idCol, textCol, maxOverlapFrac)

  /** [[decontaminateAgainst]] with a PRE-HASHED universe (column `h`) — the
    * form a streaming pass reuses across epochs without re-shingling the
    * benchmark every micro-batch. */
  def decontaminateAgainstUniverse(train: DataFrame, universe: DataFrame,
                                   idCol: String, textCol: String,
                                   maxOverlapFrac: Double = 0.5): DataFrame = {
    val benchH = broadcast(universe.select(col("h")).withColumn("__hit", lit(1)))
    // native shingle-slice hashing: the train-side scan is the corpus
    // term of decontamination, and it no longer allocates shingle strings
    train
      .select(col(idCol), explode(ShingleHash.h28(col(textCol))).as("h"))
      .join(benchH, Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__hit") === 1, 1L).otherwise(0L)).as("n_overlap"))
      .withColumn("overlap_frac",
        col("n_overlap").cast("double") / col("n_shingles"))
      .withColumn("contaminated", col("overlap_frac") >= maxOverlapFrac)
  }

  /**
   * Cross-document repeated span detection — the tractable form of
   * exact-substring dedup (Lee et al.'s "Deduplicating Training Data
   * Makes Language Models Better" finds repeated 50-token substrings via
   * a suffix array; a distributed engine gets most of the value from
   * FIXED token windows). Every `win`-token window at stride `stride` is
   * hashed; a span whose hash appears in more than one distinct document
   * is repeated corpus text — boilerplate, license headers, syndicated
   * content, benchmark leakage. Returns
   * `(span_md5, n_docs, min_doc, max_doc)` per repeated span.
   *
   * Recall: with `stride = 1` every repeat of ≥ win tokens is caught
   * (exact recall, one span per token of cost). With `stride > 1`,
   * windows start at multiples of stride in EACH document, so a repeat
   * is caught iff its start offsets agree modulo stride (~1/stride for
   * random alignment — but boilerplate is typically position-stable at
   * offset 0, which always agrees). Choose stride by recall budget.
   *
   * Scale shape: explode ≈ words/stride spans per doc (md5-hashed
   * immediately — raw span text never shuffles), then ONE groupBy on the
   * 128-bit span hash (uniform by construction, no skew) with
   * count_distinct(doc) — Spark plans the distinct as its usual
   * two-phase expand. Output is bounded by the number of REPEATED spans,
   * not the corpus.
   */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    win: Int = 8, stride: Int = 4): DataFrame = {
    require(win > 0 && stride > 0 && stride <= win,
      s"need 0 < stride <= win, got win=$win stride=$stride")
    df.select(col(idCol),
        posexplode(TextFns.chunks(col(textCol), win, win - stride)))
      .filter(col("col.n_tokens") === win) // full windows only
      .select(col(idCol), md5(col("col.chunk")).as("span_md5"))
      .groupBy(col("span_md5"))
      .agg(count_distinct(col(idCol)).as("n_docs"),
        min(col(idCol)).as("min_doc"), max(col(idCol)).as("max_doc"))
      .filter(col("n_docs") > 1)
  }

  /**
   * Cross-document repeated-span REMOVAL — the document-REWRITING form
   * of [[repeatedSpans]], the way [[dedupLines]] rewrites lines: every
   * token covered by ANY `win`-token window (at stride `stride`)
   * whose hash appears in ≥ `minDocs` distinct documents is removed,
   * and each document comes back rebuilt from its surviving tokens in
   * original order — (idCol, clean_text, n_tokens_removed). This is
   * the production "exact substring dedup" pass (Lee et al. remove the
   * repeated 50-token substrings they find; detection without removal
   * leaves the boilerplate in the training set).
   *
   * Removal is TOKEN-COVERAGE based: overlapping repeated windows
   * union their covered positions, so a long syndicated passage
   * disappears wholesale rather than leaving stride-boundary slivers.
   * Recall follows [[repeatedSpans]]' stride contract (stride 1 =
   * every ≥ win-token repeat; larger strides catch offset-aligned
   * repeats — boilerplate is typically position-stable).
   *
   * Scale shape: the window explode (≈ words/stride rows, hashed
   * immediately) feeds ONE uniform groupBy for the repeated set; the
   * covered-position explode is bounded by win × repeated-window
   * occurrences; the token explode is corpus-linear; the anti join's
   * key side is (doc, pos) pairs of covered tokens — bounded by the
   * repeated text, not the corpus. No corpus × corpus anywhere. The
   * input is scanned twice (windows + tokens), so it must be
   * deterministic — the [[dedupLines]] contract (parquet-backed frames
   * are; checkpoint anything sampled). A fully-boilerplate document
   * returns clean_text = "" (kept as a row — the caller's quality gate
   * decides).
   */
  def stripRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                         win: Int = 8, stride: Int = 4,
                         minDocs: Int = 2): DataFrame = {
    require(win > 0 && stride > 0 && stride <= win,
      s"need 0 < stride <= win, got win=$win stride=$stride")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // windows with START positions: chunk i at overlap win-stride
    // starts at token i*stride (the repeatedSpans window arithmetic,
    // kept with the position the coverage explode needs); hashed
    // immediately — raw span text never shuffles
    val wins = df.select(col(idCol),
        posexplode(TextFns.chunks(col(textCol), win, win - stride))
          .as(Seq("__ci", "__c")))
      .filter(col("__c.n_tokens") === win) // full windows only
      .select(col(idCol), (col("__ci") * stride).as("__start"),
        md5(col("__c.chunk")).as("__k"))
      .localCheckpoint(false) // feeds the dup set AND the coverage join
    val dup = wins.groupBy(col("__k"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__k"))
    // token positions covered by any repeated window, per document
    val covered = wins.join(dup, Seq("__k"))
      .select(col(idCol), explode(sequence(col("__start"),
        col("__start") + lit(win - 1))).as("__pos"))
      .distinct()
    val toks = df.select(col(idCol),
        posexplode(TextFns.words(col(textCol))).as(Seq("__pos", "__tok")))
      .localCheckpoint(false) // feeds the strip AND the totals
    val kept = toks.join(covered, Seq(idCol, "__pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__tok")))),
            e => e.getField("__tok"))).as("clean_text"),
        count(lit(1)).as("__kept"))
    val totals = toks.groupBy(col(idCol)).agg(count(lit(1)).as("__tot"))
    df.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (coalesce(col("__tot"), lit(0L)) - coalesce(col("__kept"), lit(0L)))
          .as("n_tokens_removed"))
  }

  /**
   * Line-level corpus dedup, the document-REWRITING form (the
   * boilerplate-removal pass web-scale training pipelines run before
   * document-level dedup: navigation chrome, cookie banners, and license
   * headers repeat across a domain's pages while the documents
   * themselves are distinct, so document-granular dedup never sees
   * them): every line occurring in at least `minDocs` DISTINCT
   * documents is removed from every document that contains it, and each
   * document comes back rewritten — (idCol, clean_text, n_removed) —
   * with its surviving lines re-joined in original order. Lines shorter
   * than `minLineChars` (blank separators, "1.", stray punctuation) are
   * never treated as duplicates: ubiquitous-but-tiny lines are
   * structure, not boilerplate, and removing them would mangle every
   * document in the corpus.
   *
   * Scale shape: explode to (doc, pos, line) — corpus-linear, like the
   * shingle index — then one line-keyed aggregate finds the duplicated
   * lines, a left-anti join drops them, and one doc-keyed aggregate
   * re-joins survivors (positions make the rebuild order-exact under
   * any partitioning). No corpus × corpus anywhere; the duplicated-line
   * side of the anti join is bounded by the number of REPEATED lines,
   * not the corpus, and AQE picks broadcast when it fits. Join keys are
   * the exact line strings — the string-exact anchor ([[ngramJaccard]]
   * precedent); a hash-keyed variant would shuffle 8-byte keys instead
   * but admit (vanishingly rare) collision-removals.
   *
   * A document whose every line is boilerplate yields clean_text = ""
   * (kept as a row — the caller decides whether empty docs survive, and
   * a downstream [[graft.functions.TextFns.qualityScore]] gate drops
   * them naturally).
   */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 minDocs: Int = 2, minLineChars: Int = 10): DataFrame =
    dedupLinesKeyed(df, idCol, textCol, minDocs, minLineChars, identity,
      materializeKey = false)

  /**
   * [[dedupLines]]'s 100 TB shape ([[ngramJaccardByHash]] precedent):
   * the duplicated-line detection and the strip join key on the 60-BIT
   * HASH of each line instead of the line string, so the line-keyed
   * shuffle and the anti join move 8-byte keys, not line text. A 60-bit
   * collision (P ≈ n_lines² / 2^60 corpus-wide) removes an innocent
   * line along with a true boilerplate line — the standard vanishing
   * trade; the rebuild still uses the exact strings and positions, so
   * everything kept is byte-exact.
   */
  def dedupLinesByHash(df: DataFrame, idCol: String, textCol: String,
                       minDocs: Int = 2, minLineChars: Int = 10): DataFrame =
    dedupLinesKeyed(df, idCol, textCol, minDocs, minLineChars, hash60,
      materializeKey = true)

  /**
   * The FROZEN-TABLE half of [[dedupLinesByHash]] for streaming
   * composition (the Bloom-blocklist pattern): one corpus-linear pass
   * over a REFERENCE corpus yields the 60-bit keys of every line
   * repeated in ≥ `minDocs` distinct documents — the boilerplate set a
   * crawl pipeline strips from every arriving page. Built once before a
   * stream starts; [[stripLinesByKeys]] then rewrites each micro-batch
   * against it statelessly (frozen keys → batches independent → replay
   * idempotent for free).
   *
   * Scale shape: explode + ONE aggregate keyed on the 8-byte line hash
   * (uniform, no skew); output bounded by the number of REPEATED lines,
   * not the corpus.
   */
  def repeatedLineKeys(corpus: DataFrame, idCol: String, textCol: String,
                       minDocs: Int = 2, minLineChars: Int = 10): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    corpus.select(col(idCol),
        explode(split(col(textCol), "\n")).as("__line"))
      .filter(length(col("__line")) >= minLineChars)
      .groupBy(hash60(col("__line")).as("__lk"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__lk"))
  }

  /**
   * Rewrite `docs` against a frozen [[repeatedLineKeys]] table: every
   * line whose 60-bit hash is in `lineKeys` is removed, the survivors
   * re-join in original order, `textCol` is REPLACED by the cleaned
   * text, and `n_lines_removed` is appended — all other columns pass
   * through untouched (the streaming prep pipeline carries embeddings
   * beside the text). Against keys built FROM the same docs this is
   * exactly [[dedupLinesByHash]]'s rewrite (spec-pinned); against a
   * reference-corpus table it is the production shape — new pages
   * stripped of known boilerplate without re-scanning the corpus.
   *
   * The anti join's key side is bounded by the repeated-line set, and
   * deliberately un-hinted: AQE broadcasts it when it fits, which at
   * blocklist scale it does.
   *
   * `idCol` is the rebuild key and must be UNIQUE in `docs` (the
   * [[dedupLines]] contract): duplicate ids would merge both copies'
   * lines into one interleaved rebuild. The streaming composition
   * collapses at-least-once redeliveries BEFORE this stage. The input
   * is checkpointed once here — it feeds the exploded lines AND the
   * final doc-row join, and two evaluations of a nondeterministic
   * upstream could pair a doc row with counts from different text.
   */
  def stripLinesByKeys(docs: DataFrame, lineKeys: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val d = docs.localCheckpoint(false)
    // exploded lines feed the strip AND the totals (no cross-branch CSE)
    val lines = d.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__mk", hash60(col("__line")))
      .localCheckpoint(false)
    val kept = lines
      .join(lineKeys, lines("__mk") === lineKeys("__lk"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        concat_ws("\n",
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__line")))),
            e => e.getField("__line"))).as("__clean"),
        count(lit(1)).as("__kept"))
    val totals = lines.groupBy(col(idCol))
      .agg(count(lit(1)).as("__tot"))
    d.join(totals, Seq(idCol), "left")
      .join(kept, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("__clean"), lit("")))
      .withColumn("n_lines_removed",
        coalesce(col("__tot"), lit(0L)) - coalesce(col("__kept"), lit(0L)))
      .drop("__clean", "__tot", "__kept")
  }

  /** Shared core of the two line-dedup forms: `keyOf(line)` is the dup
    * key — the line itself (exact anchor, `materializeKey = false`: the
    * key IS the line, adding a column would shuffle every string twice)
    * or its 60-bit hash (scale, `materializeKey = true`: the md5 folds
    * ONCE into the checkpointed explode instead of once per consumer —
    * measured 33 → 24 s at a 500k-doc corpus). */
  private def dedupLinesKeyed(df: DataFrame, idCol: String, textCol: String,
                              minDocs: Int, minLineChars: Int,
                              keyOf: Column => Column,
                              materializeKey: Boolean): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // the exploded lines feed the dup detection AND the rebuild (no
    // cross-branch CSE in Spark); checkpointed like the shingle index
    val exploded = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val lines = (if (materializeKey)
      exploded.withColumn("__mk", keyOf(col("__line")))
    else exploded).localCheckpoint(false)
    // the materialized key must stay QUALIFIED where a self-join is in
    // play: an unqualified col("__mk") resolves today only because the
    // dup side projects nothing but __k
    def key(c: Column): Column = if (materializeKey) lines("__mk") else keyOf(c)
    val dup = lines
      .filter(length(col("__line")) >= minLineChars)
      .groupBy(key(col("__line")).as("__k"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__k"))
    val kept = lines
      .join(dup, key(lines("__line")) === dup("__k"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        concat_ws("\n",
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__line")))),
            e => e.getField("__line"))).as("clean_text"),
        count(lit(1)).as("__kept"))
    val totals = lines.groupBy(col(idCol))
      .agg(count(lit(1)).as("__tot"))
    // left joins from the input: a fully-boilerplate doc has no kept
    // rows but must still come back (empty, with its removal count)
    df.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (coalesce(col("__tot"), lit(0L)) - coalesce(col("__kept"), lit(0L)))
          .as("n_removed"))
  }
}
