package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.{Bloom, Dedup, Similarity}

/**
 * Streaming relational capabilities over the changeset/event stream —
 * the operations the reference cannot express at all (SURVEY §2.5 lists
 * streaming windows/state as a declared capability extension).
 *
 * All of these run identically on batch frames (Spark's unified engine),
 * which is how their semantics are oracle-checked; the streaming tests
 * drive them through real micro-batch execution.
 */
object StreamOps {

  /**
   * At-least-once → exactly-once event dedup inside a watermark window:
   * duplicates of the same changeset id arriving within the watermark are
   * dropped (the reference's duplicate-insert skip, pushed to the stream
   * edge). On a streaming frame requires `withWatermark` upstream.
   */
  def dedupWithinWatermark(cs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    cs.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("id")

  /** Batch-equivalent dedup (same key). */
  def dedupBatch(cs: DataFrame): DataFrame = cs.dropDuplicates("id")

  /**
   * Streaming benchmark decontamination — the ingest-time form of
   * [[graft.functions.Dedup.decontaminateAgainst]]: every arriving
   * training document is scored against the (fixed) benchmark shingle
   * universe, and only clean docs are admitted to `outPath`.
   *
   * The universe is hashed ONCE up front (eagerly checkpointed — eval
   * suites are fixed-size, so this is a tiny broadcast table reused by
   * every micro-batch, never re-shingled). Writes are epoch-idempotent:
   * each batch lands in a `batch=<epoch>` partition with overwrite, so a
   * crash-replayed batch rewrites its own output instead of duplicating
   * it — the same recovery contract as [[nearDupDedupTo]].
   *
   * Docs with no shingles (< 3 words) have nothing to test overlap on
   * and are NOT admitted, matching the batch operator's domain.
   */
  def decontaminateTo(docs: DataFrame, bench: DataFrame, outPath: String,
                      checkpoint: String, idCol: String, textCol: String,
                      maxOverlapFrac: Double = 0.5,
                      availableNow: Boolean = true): StreamingQuery = {
    val universe = Dedup.shingleUniverse(bench, textCol)
      .localCheckpoint() // eager: materialize before the stream starts
    val writer = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // the batch feeds the scoring pass AND the output semi-join —
        // cache for the epoch so the source isn't read twice
        val batch = batch0.cache()
        try {
          val clean = Dedup.decontaminateAgainstUniverse(
            batch, universe, idCol, textCol, maxOverlapFrac)
            .filter(!col("contaminated"))
            .select(col(idCol))
          batch.join(clean, Seq(idCol), "left_semi")
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        } finally { batch.unpersist(false); () }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /**
   * Constant-memory streaming blocklist filtering: the exact-key
   * counterpart of [[decontaminateTo]] for blocklists too large to
   * broadcast as an exact set. The [[graft.functions.Bloom]] filter is
   * sized (`Bloom.sizeFor`) and built ONCE before the stream starts
   * (eagerly checkpointed one-row frame), then every micro-batch is a
   * single scan with `k` inlined bit tests — no join, no shuffle, no
   * per-batch state growth.
   *
   * Bloom semantics: zero false negatives — no blocklisted key is ever
   * admitted; `fpp` bounds how much CLEAN data is over-dropped. Writes
   * are epoch-idempotent (`batch=<epoch>` overwrite), same recovery
   * contract as [[decontaminateTo]].
   */
  def bloomDecontaminateTo(docs: DataFrame, blockKeys: DataFrame,
                           outPath: String, checkpoint: String,
                           keyCol: String, fpp: Double = 1e-3,
                           availableNow: Boolean = true): StreamingQuery = {
    // the blocklist is static for the life of the query: size and build
    // the filter up front (count is one tiny driver-side action)
    val n = math.max(1L, blockKeys.select(col(keyCol)).count())
    val (m, k) = Bloom.sizeFor(n, fpp)
    val filterRow = Bloom.build(blockKeys, col(keyCol), m, k)
      .localCheckpoint() // eager: materialize before the stream starts
    val writer = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.crossJoin(broadcast(filterRow))
          .withColumn("__hit",
            Bloom.mightContain(col("__bloom"), col(keyCol), m, k))
          .filter(!col("__hit")).drop("__bloom", "__hit")
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /**
   * Streaming unigram-LM quality gate —
   * [[graft.functions.TextFns.unigramLmScoreAgainst]] at the ingest edge,
   * the CCNet device in streaming form: the model is TRAINED ONCE
   * pre-stream on a curated reference corpus, then every micro-batch is
   * scored against it and documents below `minHmProb` are dropped.
   *
   * Scale shape: the model is vocabulary-sized and static for the life
   * of the query (built and checkpointed up front, like the Bloom
   * filter above); per batch the work is one (doc, term) tf aggregate
   * and the vocabulary join — no state store, no cross-batch shuffle.
   * Epoch-idempotent `batch=<id>` overwrite writes, same crash contract
   * as the other sinks here. Admitted rows carry their (n_tokens,
   * n_oov, hm_prob) columns for downstream accounting.
   */
  def lmScoreTo(docs: DataFrame, modelCorpus: DataFrame, outPath: String,
                checkpoint: String, idCol: String, textCol: String,
                minHmProb: Double = 0.0,
                availableNow: Boolean = true): StreamingQuery = {
    val model = graft.functions.TextFns.unigramModel(modelCorpus, textCol)
      .localCheckpoint() // eager: built once before the stream starts
    val writer = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val scores = graft.functions.TextFns
          .unigramLmScoreAgainst(model, batch, idCol, textCol)
        batch.join(scores, idCol)
          .filter(col("hm_prob") >= minHmProb)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /**
   * Streaming near-duplicate dedup at the ingest edge — the online form of
   * [[graft.functions.Dedup.nearDupClusters]]: admit a document iff it is
   * not a near-dup of anything already admitted.
   *
   * Per micro-batch:
   *  1. the batch dedups against ITSELF with the full batch cascade
   *     (exact groups → MinHash-LSH candidates → exact-Jaccard verify →
   *     connected components; keep each component's min id);
   *  2. surviving representatives verify against the ADMITTED corpus:
   *     their LSH band keys join the accumulated key index (bucket-local —
   *     never corpus × batch), and candidates exact-Jaccard against the
   *     stored shingle sets; matches are dropped;
   *  3. survivors land in `outPath`/`statePath` under a `batch=<epoch>`
   *     subdirectory with overwrite — a crash-replayed micro-batch
   *     rewrites its own epoch (no duplicate admissions), and the verify
   *     step excludes the replayed epoch's own state rows (no
   *     self-match drops). Effectively-once without a transaction.
   *
   * Semantics note (documented divergence from the batch operator): this
   * is the standard greedy online rule. For a chain A~B, B~C with A≁C
   * arriving in different batches, batch connected-components keeps only
   * A, while the greedy stream admits A and C (B dropped) — C matched no
   * ADMITTED doc at its arrival. Within one batch the cascade applies, so
   * a single-batch run equals the batch operator exactly.
   *
   * Scale shape: state is two append-only parquet tables (keys: 4 rows ×
   * ~40 B per admitted doc; sets: the shingle arrays — the bulk). The
   * candidate join is (band, bkey)-bucketed, and on a NEW state the sets
   * table is id-bucket partitioned (`ib=` dirs inside each epoch,
   * recorded in a layout marker), so each epoch's verify reads only the
   * CANDIDATE ids' buckets — the sets scan stops growing with the
   * corpus. The banded layout trades a constant per-epoch cost (≤64
   * bucket dirs written and listed per epoch — measured ~1.3 s/epoch
   * over flat at a 5k-doc state, where pruning saves little) for the
   * corpus-proportional scan; a long-lived ingest state grows without
   * bound and cannot switch layouts mid-life, so banded is the default
   * — pass `bandedState = false` for a deliberately small corpus. A
   * marker-less pre-existing state keeps the legacy flat layout (mixed
   * layouts under one partition root would break every read); rebuild
   * the state to adopt the banded form. The keys table is NOT scanned
   * whole per epoch: band-prefix partitioning was measured not to pay
   * there (a batch's keys span all 256 hash prefixes), so the scan is
   * bounded at the EPOCH level instead — each epoch writes a Bloom
   * summary of its band keys ([[KeySummaries]]) and later epochs read
   * only the epoch partitions that might contain one of their keys, so
   * a no-candidate batch reads zero state bytes from either table.
   */
  def nearDupDedupTo(docs: DataFrame, outPath: String, statePath: String,
                     checkpoint: String, idCol: String, textCol: String,
                     minJaccard: Double = 0.8,
                     availableNow: Boolean = true,
                     bandedState: Boolean = true): StreamingQuery = {
    val writer = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // the batch feeds the cascade, the rep semi-join, and the epoch
        // writes — cache it for the duration of the epoch
        val batch = batch0.cache()
        try {
          dedupEpoch(batch, batchId, statePath, idCol, textCol, minJaccard,
            bandedState)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        } finally { batch.unpersist(false); () }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /**
   * One epoch of the online near-dup dedup — the foreachBatch core of
   * [[nearDupDedupTo]], factored out so [[prepPipelineTo]] can compose it
   * with other stages. Runs the batch-internal cascade, verifies the
   * survivors against the admitted-corpus state (excluding THIS epoch's
   * rows, for crash-replay safety), writes the epoch's state partitions
   * (keys/sets, overwrite-idempotent), and returns the admitted docs
   * frame (backed by checkpointed inputs — safe to consume after the
   * state writes). `batch` must be cached/materialized by the caller.
   */
  /** id-bucket count of a NEW streaming dedup state's sets table: each
    * epoch's admitted shingle sets land under `ib=<id mod this>` dirs
    * inside their `batch=` partition, so the verify step reads only the
    * CANDIDATE ids' buckets instead of the whole accumulated sets table
    * — the sets are the state's bulk (full shingle arrays; keys are 4
    * short rows/doc), and their per-batch full scan was the one
    * corpus-growing term of the ingest path. Recorded in a marker at
    * state creation so every later epoch (and [[compactState]]) agrees;
    * a pre-existing marker-less state stays on the legacy flat layout
    * forever (mixing layouts under one partition-discovery root would
    * break every read). */
  private[graft] val StateSetBuckets = 64

  private def stateLayoutPath(statePath: String) =
    new org.apache.hadoop.fs.Path(s"$statePath/_graft_state_layout")

  /** The layout is fixed at state creation, so resolve it ONCE per JVM
    * per state path — a continuous-mode stream would otherwise pay
    * marker round-trips (fs.exists + open) against HDFS/object-store on
    * every trigger for a value that cannot change. */
  private val stateLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Int]]()

  /** Some(buckets) → banded sets layout; None → legacy flat. Marker
    * present wins ([[graft.functions.LayoutMarker]] — atomic write, loud
    * failure on malformed content); absent + existing state tables =
    * legacy; absent + fresh state = write the marker and go banded
    * (crash between marker and first epoch write replays clean — marker
    * present, tables read as empty). */
  private def resolveStateLayout(fs: org.apache.hadoop.fs.FileSystem,
                                 statePath: String, keysPath: String,
                                 setsPath: String,
                                 wantBanded: Boolean): Option[Int] = {
    import graft.functions.LayoutMarker
    val p = stateLayoutPath(statePath)
    def fromDisk(): Option[Int] =
      LayoutMarker.read(fs, p, "ibsets|", "dedup-state").orElse {
        if (fs.exists(new org.apache.hadoop.fs.Path(keysPath)) ||
          fs.exists(new org.apache.hadoop.fs.Path(setsPath))) None // legacy
        else if (!wantBanded) None // caller opted out for a small corpus
        else {
          LayoutMarker.write(fs, p, "ibsets|", StateSetBuckets)
          Some(StateSetBuckets)
        }
      }
    val resolved0 = stateLayoutCache.computeIfAbsent(statePath, _ => fromDisk())
    // a cached None (legacy flat) must not outlive the tables it was
    // resolved FROM: deleting a legacy state and recreating it at the
    // same path in the same JVM would otherwise silently yield a new
    // flat state even with wantBanded=true — the fresh-state "write
    // marker and go banded" branch never re-fires. When the cached
    // resolution is None and the state tables (and marker) have
    // vanished, invalidate and re-resolve (cheap exists() checks, the
    // same per-epoch re-anchor discipline as the Some case below).
    // ... and a cached None must also yield to a marker that APPEARED
    // since it was resolved: [[nearDupStateBootstrap]] or
    // [[migrateStateToPartitioned]] run from ANOTHER JVM write the
    // marker behind this cache's back, and honoring the stale None
    // would write flat epochs into a banded tree.
    val resolved = resolved0 match {
      case None if fs.exists(p) ||
        (!fs.exists(new org.apache.hadoop.fs.Path(keysPath)) &&
          !fs.exists(new org.apache.hadoop.fs.Path(setsPath))) =>
        stateLayoutCache.remove(statePath)
        stateLayoutCache.computeIfAbsent(statePath, _ => fromDisk())
      case r => r
    }
    // the cache must not outlive the marker: a state deleted and
    // recreated at the SAME path in one JVM would otherwise get banded
    // epochs with no on-disk marker — which a later JVM reads as legacy,
    // silently mixing layouts. One exists() per epoch re-anchors the
    // cached decision to disk (still no open/read round-trip).
    resolved.foreach(b =>
      if (!fs.exists(p)) LayoutMarker.write(fs, p, "ibsets|", b))
    resolved
  }

  private def idBucket(id: org.apache.spark.sql.Column, buckets: Int) =
    graft.functions.Dedup.idBucket(id, buckets) // one bucket definition

  /** Epoch directory ids present under a state table root (`batch=N`
    * names) — a metadata-only FS listing. */
  private def listStateEpochs(fs: org.apache.hadoop.fs.FileSystem,
                              root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("batch=") =>
        n.stripPrefix("batch=").toLongOption }
      .flatten
  }

  private[graft] def keySummaryPath(statePath: String, epoch: Long) =
    new org.apache.hadoop.fs.Path(s"$statePath/keysum/batch=$epoch")

  /** `summaryCap` overrides [[KeySummaries.MaxKeys]] ONLY in specs: a
    * cap of 1 routes a small batch through the over-cap degrade (no
    * pruning, full state scan, no summary written for the epoch), which
    * would otherwise need a ~65k-doc batch to reach. Production callers
    * take the default. */
  private[graft] def dedupEpoch(batch: DataFrame, batchId: Long,
                                statePath: String,
                                idCol: String, textCol: String,
                                minJaccard: Double,
                                wantBanded: Boolean = true,
                                summaryCap: Int = KeySummaries.MaxKeys)
      : DataFrame = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keysPath = s"$statePath/keys"
    val setsPath = s"$statePath/sets"
    // integral ids were always a de-facto requirement here (the cascade's
    // union-find collects long ids; string ids died deep inside it with a
    // bare ClassCastException) and the banded bucket column would
    // null-cast them — make the contract explicit and fail at the door
    graft.functions.TopKAgg.requireIntegralId(batch, idCol,
      "streaming near-dup dedup")
    val setBuckets = resolveStateLayout(fs, statePath, keysPath, setsPath,
      wantBanded)
    // 1. batch-internal cascade (exact + near) → representatives
    val reps = Dedup.nearDupClusters(batch, idCol, textCol, minJaccard)
      .filter(col(idCol) === col("cluster_id")).select(col(idCol))
    val repDocs = batch.join(reps, Seq(idCol), "left_semi")
      .localCheckpoint() // reused: sets, verify, output write
    val repSets = Dedup.shingleSets(repDocs, idCol, textCol)
      .localCheckpoint()
    val repKeys = Dedup.bandKeysFromSets(repSets, idCol)
      .localCheckpoint() // reused: candidate join + admitted write

    // 2. verify representatives against the admitted corpus.
    // State rows of THIS epoch are excluded so a crash-replay of the
    // batch does not match its docs against their own replayed index
    // entries (which would silently drop them).
    //
    // Each state table reads independently with an EXPLICIT schema
    // (its epoch frame's schema + the batch partition column) and an
    // absent-or-empty directory reads as EMPTY state: a crash at ANY
    // point of the epoch writes (e.g. keys/ committed but sets/ not yet
    // created, or only _temporary present) must replay cleanly, never
    // wedge on path-not-found or schema inference.
    import org.apache.spark.sql.types.LongType
    def emptyState(full: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
    def stateOrEmpty(path: String,
                     schema: org.apache.spark.sql.types.StructType) = {
      val full = schema.add("batch", LongType)
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        spark.read.schema(full).parquet(path)
      else emptyState(full)
    }
    // EPOCH-LEVEL pruning of the state reads via the per-epoch band-key
    // summaries ([[KeySummaries]]): the batch's own distinct band keys
    // (ONE bounded collect, reused below to build this epoch's summary)
    // are tested against each prior epoch's Bloom file, and only the
    // epochs that might contain a match are read — from BOTH tables,
    // since a candidate id's sets rows live in the epoch that admitted
    // it. Bloom ⇒ no false negatives ⇒ admissions are bit-identical to
    // the full scan; an epoch with no summary (legacy state, compacted
    // batch=-1, over-cap batch) is always read, and a batch over the
    // collect cap degrades to the full scan — never to a missed
    // candidate.
    val batchKeys: Option[Array[String]] =
      KeySummaries.cappedDistinct(repKeys.select(col("bkey")),
        cap = summaryCap)
    val candidateEpochs: Option[Seq[Long]] = batchKeys.map(ks =>
      KeySummaries.pruneEpochs(fs,
        listStateEpochs(fs, keysPath).filter(_ != batchId), ks,
        m => keySummaryPath(statePath, m)))
    val setsSchema = setBuckets.fold(repSets.schema)(_ =>
      repSets.schema.add("ib", org.apache.spark.sql.types.IntegerType))
    def readEpochs(root: String,
                   schema: org.apache.spark.sql.types.StructType,
                   eps: Seq[Long]) = {
      val full = schema.add("batch", LongType)
      val dirs = eps.map(m => s"$root/batch=$m")
        .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
      if (dirs.isEmpty) emptyState(full)
      else spark.read.option("basePath", root).schema(full)
        .parquet(dirs: _*)
    }
    val (stateKeys, stateSetsAll) = candidateEpochs match {
      case Some(eps) =>
        (readEpochs(keysPath, repKeys.schema, eps),
          readEpochs(setsPath, setsSchema, eps))
      case None =>
        (stateOrEmpty(keysPath, repKeys.schema)
          .filter(col("batch") =!= batchId),
          stateOrEmpty(setsPath, setsSchema)
            .filter(col("batch") =!= batchId))
    }
    val cand0 = repKeys
      .join(stateKeys.select(col(idCol).as("__sid"),
        col("band"), col("bkey")), Seq("band", "bkey"))
      .select(col(idCol), col("__sid")).distinct()
    // banded layout: the candidates' id buckets (bounded ≤ setBuckets,
    // one driver-side collect) become a partition filter on the sets
    // read — the verify touches only buckets that can hold a candidate,
    // not the whole accumulated table. cand is checkpointed because it
    // feeds the bucket collect AND the verify join.
    val (cand, stateSets) = setBuckets match {
      case Some(b) =>
        val c = cand0.localCheckpoint(false)
        // ONE job for the candidate buckets AND the candidate-id range:
        // the [lo, hi] filter is a SUPERSET of the candidate ids (the
        // verify join still decides membership — admissions identical),
        // but it pushes to parquet, and the state's sets files carry
        // id-sorted row groups (bootstrap/compaction sort within
        // partitions) so clustered candidates — the common shape: recent
        // docs duplicate recent docs — skip most row groups instead of
        // scanning every hit bucket whole. Uniform candidates degrade to
        // exactly the old ib-pruned scan, never to a miss. No cast on
        // the id column (min/max collected in its own type) or the
        // pushdown would silently vanish.
        val agg = c.agg(
          collect_set(idBucket(col("__sid"), b)).as("ibs"),
          min(col("__sid")), max(col("__sid"))).head()
        val ibs = agg.getSeq[Int](0)
        if (ibs.isEmpty) (c, stateSetsAll.filter(lit(false)))
        else (c, stateSetsAll.filter(col("ib").isin(ibs: _*) &&
          col(idCol) >= lit(agg.get(1)) && col(idCol) <= lit(agg.get(2))))
      case None => (cand0, stateSetsAll)
    }
    val dupIds = cand
      .join(repSets, Seq(idCol))
      .join(stateSets.select(col(idCol).as("__sid"),
        col("sset").as("__ss")), Seq("__sid"))
      .filter(
        size(array_intersect(col("sset"), col("__ss"))).cast("double") /
          size(array_union(col("sset"), col("__ss"))) >= minJaccard)
      .select(col(idCol)).distinct()
      .localCheckpoint() // reused by the three anti-joins below

    // 3. IDEMPOTENT per-epoch writes: every output lands in a
    // batch=<epoch> subdirectory with overwrite, so a replayed batch
    // rewrites its own epoch instead of appending duplicates
    // (partition discovery exposes the epoch as the `batch` column
    // that step 2's exclusion filter prunes on). Admitted keys/sets
    // are anti-joined from the checkpointed rep frames — no
    // re-shingling or re-hashing.
    def anti(d: DataFrame) = d.join(dupIds, Seq(idCol), "left_anti")
    anti(repKeys).write.mode("overwrite")
      .parquet(s"$keysPath/batch=$batchId")
    // this epoch's band-key summary, from the SAME bounded collect the
    // probe used: the pre-anti key set is a superset of the admitted
    // keys (a dropped dup's key only costs a later batch one false
    // epoch read — never a false negative), and a replayed epoch
    // rewrites an identical summary (same batch → same keys). Over-cap
    // batches write none: absent = always-read, the conservative
    // default. Written AFTER the keys epoch so a present summary always
    // describes committed rows.
    batchKeys.foreach(ks => KeySummaries.write(fs,
      keySummaryPath(statePath, batchId), KeySummaries.build(ks)))
    setBuckets match {
      case Some(b) => // write in the banded layout the marker records:
        // repartition BY the bucket column, capped at the bucket count
        // (the default shuffle width would run ~3x empty tasks per
        // epoch on this hot path), so each dir gets one file
        anti(repSets).withColumn("ib", idBucket(col(idCol), b))
          .repartition(Dedup.writeTasks(repSets, b), col("ib"))
          .write.mode("overwrite").partitionBy("ib")
          .parquet(s"$setsPath/batch=$batchId")
      case None =>
        anti(repSets).write.mode("overwrite")
          .parquet(s"$setsPath/batch=$batchId")
    }
    anti(repDocs)
  }

  /**
   * The END-TO-END streaming prep pipeline — the online form of the batch
   * `pipeline_e2e` query: every micro-batch flows through
   *
   *   Bloom decontamination → online near-dup dedup → [embedding
   *   cross-dedup vs a frozen IVF index] → [unigram-LM fluency gate] →
   *   quality filter → deterministic split + per-epoch accounting
   *
   * in ONE foreachBatch, sharing one checkpoint/epoch id, so the whole
   * composition (not each operator separately) is crash-replay
   * idempotent: every stage's output for epoch N lands under a
   * `batch=N` partition with overwrite, and the dedup state verify
   * excludes epoch N's own rows — a replayed epoch rewrites exactly
   * itself (StreamOpsSpec proves post-crash ≡ uninterrupted, with and
   * without the LM stage).
   *
   * The LM gate ([[lmScoreTo]]'s scoring stage) joins the composition
   * when `modelCorpus` is given: the unigram model is trained ONCE
   * before the stream starts (the Bloom pre-build pattern), and each
   * epoch's dedup survivors are scored and admitted iff
   * `hm_prob >= minHmProb` — without this a production pipeline had to
   * run TWO passes over every micro-batch (this pipeline, then a
   * separate [[lmScoreTo]] stream) to get both gates. It sits between
   * dedup and quality so junk still enters the dedup state exactly as
   * before (a near-dup of junk is still a dup) and admitted rows carry
   * their (n_tokens, n_oov, hm_prob) columns into `docs/batch=N` for
   * downstream accounting.
   *
   * Layout: `outPath/docs/batch=N` (admitted docs + quality + split
   * [+ LM columns]) and `outPath/accounting/batch=N` (per-split
   * doc/token counts); dedup state under `statePath` as in
   * [[nearDupDedupTo]].
   *
   * The EMBEDDING gate ([[embedDedupTo]]'s admission stage) joins the
   * composition when `embedIndex` is given: each epoch's TEXT-dedup
   * survivors probe the frozen persisted IVF index at that path (k = 1)
   * and are admitted iff their best corpus cosine is under
   * `embedMinCos` — the SemDeDup decision inline, so a paraphrased
   * near-dup of the trained corpus (fresh text, same meaning) is
   * dropped in the same pass. It sits between dedup and the LM gate:
   * dedup stages stay adjacent (semantic dups still enter the text
   * state — a text-near-dup of a semantic dup is still a text dup) and
   * rejected docs never burn LM scoring. `docs` must carry `vecCol`,
   * the index must use the same id/vec column names, and — the probe
   * contract — a corpus row whose id equals the doc's id is excluded
   * as "self" (use disjoint id ranges). Admitted rows carry
   * `corpus_cos` (null = no probed-cell neighbor at all).
   *
   * The LINE stage ([[graft.functions.Dedup.stripLinesByKeys]]) joins
   * the composition when `lineKeys` is given (a frozen
   * [[graft.functions.Dedup.repeatedLineKeys]] table, built pre-stream
   * from a reference corpus — the Bloom pattern): each arriving doc is
   * rewritten with known boilerplate lines removed BEFORE anything else
   * sees it — the pass real crawl pipelines run first, so the Bloom
   * probe, the dedup state, the gates and the quality score all operate
   * on the cleaned text, and admitted rows carry `n_lines_removed`.
   * The stage is stateless against frozen keys, so replay idempotence
   * is untouched. With `lineState` set, the stage additionally runs
   * [[lineStateEpoch]]: per-epoch line-frequency state promotes lines
   * whose cumulative distinct-doc count crosses `lineMinDocs`
   * MID-STREAM, so drifting boilerplate (new crawls' chrome the frozen
   * table never saw) is stripped from every later batch — per-epoch
   * cost bounded by the batch's own lines via the same Bloom-summary
   * pruning as the dedup state, replay idempotence preserved by the
   * same own-epoch exclusions.
   *
   * The Bloom blocklist (and LM model, and line-key table) are sized
   * and built ONCE before the stream starts; the quality/split stages
   * are pure column maps. Scale shape is the sum of its parts:
   * bounded-key anti join + broadcast bitmap probe + (band,key)-bucketed
   * verify + partition-pruned index probe + per-batch tf aggregate
   * joined to the broadcast-scale vocabulary + zero-shuffle maps —
   * nothing accumulates driver-side.
   */
  def prepPipelineTo(docs: DataFrame, blockKeys: DataFrame, outPath: String,
                     statePath: String, checkpoint: String, idCol: String,
                     textCol: String, minJaccard: Double = 0.8,
                     minQuality: Double = 0.2, trainPct: Int = 80,
                     valPct: Int = 10, fpp: Double = 1e-3,
                     modelCorpus: Option[DataFrame] = None,
                     minHmProb: Double = 0.0,
                     embedIndex: Option[String] = None,
                     vecCol: String = "embedding",
                     embedLabelCol: String = "cell",
                     embedMinCos: Double = 0.9,
                     lineKeys: Option[DataFrame] = None,
                     lineState: Option[String] = None,
                     lineMinDocs: Int = 2,
                     lineMinChars: Int = 10,
                     availableNow: Boolean = true,
                     bandedState: Boolean = true): StreamingQuery = {
    import graft.functions.{Dedup, Sampling, TextFns}
    val n = math.max(1L, blockKeys.select(col(textCol)).count())
    val (m, k) = Bloom.sizeFor(n, fpp)
    val filterRow = Bloom.build(blockKeys, col(textCol), m, k)
      .localCheckpoint() // eager: materialize before the stream starts
    val model = modelCorpus.map(mc => TextFns.unigramModel(mc, textCol)
      .localCheckpoint()) // eager, same pre-stream discipline as the Bloom
    val frozenLineKeys = lineKeys.map(_.localCheckpoint()) // eager too
    val writer = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0raw: DataFrame, batchId: Long) =>
        // collapse at-least-once redeliveries FIRST: the line rebuild
        // groups by id, so duplicate ids would interleave both copies'
        // lines into one corrupted text (pre-line-stage, the exact-dup
        // cascade absorbed them benignly — the strip must see uniques)
        val batch0u = batch0raw.dropDuplicates(idCol)
        // the line stage: frozen keys only (stateless strip), or the
        // incremental form ([[lineStateEpoch]]) when a line-state path
        // is given — mid-stream boilerplate is then promoted and
        // stripped from every later batch, frozen keys still honored
        val batch0 = lineState match {
          case Some(lsPath) =>
            lineStateEpoch(batch0u, batchId, lsPath, idCol, textCol,
              frozenLineKeys, lineMinDocs, lineMinChars)
          case None => frozenLineKeys.fold(batch0u)(lk =>
            Dedup.stripLinesByKeys(batch0u, lk, idCol, textCol))
        }
        val clean = batch0.crossJoin(broadcast(filterRow))
          .withColumn("__hit",
            Bloom.mightContain(col("__bloom"), col(textCol), m, k))
          .filter(!col("__hit")).drop("__bloom", "__hit")
          .cache() // feeds the cascade + rep semi-join for the epoch
        try {
          val admitted = dedupEpoch(clean, batchId, statePath, idCol,
            textCol, minJaccard, bandedState)
          val semGated = embedIndex.fold(admitted)(ip =>
            embedGate(admitted, ip, idCol, vecCol, embedLabelCol,
              embedMinCos))
          val gated = model.fold(semGated)(mdl =>
            lmGate(semGated, mdl, idCol, textCol, minHmProb))
          val fin = gated
            .withColumn("quality", TextFns.qualityScore(col(textCol)))
            .filter(col("quality") >= minQuality)
            .withColumn("split",
              Sampling.splitLabel(col(idCol), trainPct, valPct))
            .localCheckpoint() // feeds both the docs write and accounting
          fin.write.mode("overwrite")
            .parquet(s"$outPath/docs/batch=$batchId")
          fin.groupBy(col("split"))
            .agg(count(lit(1)).as("n_docs"),
              sum(size(TextFns.words(col(textCol))).cast("long"))
                .as("n_tokens"))
            .write.mode("overwrite")
            .parquet(s"$outPath/accounting/batch=$batchId")
        } finally { clean.unpersist(false); () }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** [[prepPipelineTo]]'s LM stage: score admitted docs against the
    * pre-built unigram model and keep those at or above `minHmProb`.
    * LEFT join, not inner: a doc whose text tokenizes to ZERO words
    * (null text upstream of the Bloom stage, or a future tokenizer
    * change) produces no score row, and an inner join would drop it
    * silently even at the permissive 0.0 default — diverging from the
    * ungated path, where such docs still reach the quality filter.
    * Token-less docs pass the gate with null LM columns and face the
    * quality filter like everyone else ("no tokens" is a quality
    * verdict, not an LM verdict). */
  private[graft] def lmGate(admitted: DataFrame, model: DataFrame,
                            idCol: String, textCol: String,
                            minHmProb: Double): DataFrame =
    admitted.join(
      graft.functions.TextFns.unigramLmScoreAgainst(model, admitted,
        idCol, textCol),
      Seq(idCol), "left")
      .filter(col("hm_prob").isNull || col("hm_prob") >= minHmProb)

  /** [[prepPipelineTo]]'s embedding stage: k = 1 probe of the frozen
    * persisted IVF index, admit iff the best corpus cosine is under
    * `minCos`. LEFT join for the same reason as [[lmGate]]: a doc whose
    * probed cells hold no corpus vector (or a zero-norm vector) has no
    * neighbor row and must pass, not vanish — "no neighbor" is an
    * admission, not an error. Checkpointed because the indexed probe
    * evaluates its probe frame more than once (probed-cell collect +
    * scoring join). */
  private[graft] def embedGate(admitted: DataFrame, indexPath: String,
                               idCol: String, vecCol: String,
                               labelCol: String,
                               minCos: Double): DataFrame = {
    import graft.functions.Similarity
    val a = admitted.localCheckpoint(false)
    val best = Similarity.ivfKnnJoinIndexed(a.sparkSession, indexPath,
      a.select(col(idCol).as("probe_id"), col(vecCol).as("__pv")),
      idCol, vecCol, labelCol, k = 1)
      .select(col("probe_id").as(idCol), col("cos").as("corpus_cos"))
    a.join(best, Seq(idCol), "left")
      .filter(col("corpus_cos").isNull || col("corpus_cos") < minCos)
  }

  /**
   * One epoch of STREAMING repeated-line maintenance — the line stage's
   * incremental form. The frozen [[graft.functions.Dedup
   * .repeatedLineKeys]] table strips only boilerplate known BEFORE the
   * stream started; boilerplate that becomes repeated after stream
   * start (a new crawl's navigation chrome) was never stripped. This
   * keeps per-epoch line-frequency state at `lineStatePath` and
   * PROMOTES lines as their cumulative distinct-doc count crosses
   * `minDocs`, so a line crossing the threshold mid-stream is stripped
   * from every SUBSEQUENT batch (the batch that crosses it keeps it —
   * its text was already rebuilt):
   *
   *  - `counts/batch=N`: (line-hash, distinct docs) for epoch N's
   *    POST-strip lines — already-promoted lines are stripped before
   *    counting, so a line accumulates counts only while unpromoted
   *    and each partition is bounded by its batch's own lines;
   *  - `linesum/batch=N`: a [[KeySummaries]] Bloom over the epoch's
   *    line hashes, so the threshold check reads only the prior epochs
   *    that might share a line with THIS batch (bounded by the batch's
   *    repeated lines × their spread, not the corpus — same device as
   *    the dedup state's keys pruning);
   *  - `promoted/batch=N`: the hashes that crossed `minDocs` at N.
   *
   * Replay idempotence mirrors [[dedupEpoch]], but STRICTER: the strip
   * and the threshold check read only strictly-EARLIER epochs
   * (`batch < N`, not merely excluding N's own partitions), and all
   * three writes are per-epoch overwrites — so a replayed epoch N
   * recomputes exactly its first attempt even when higher-id epochs
   * have committed since (no dependence on any disjointness argument
   * between batches' promotion sets). Returns the stripped batch
   * (checkpointed — it feeds the counting pass and the rest of the
   * pipeline). `docs` must already be id-unique.
   */
  private[graft] def lineStateEpoch(docs: DataFrame, batchId: Long,
                                    lineStatePath: String, idCol: String,
                                    textCol: String,
                                    frozenKeys: Option[DataFrame],
                                    minDocs: Int = 2,
                                    minLineChars: Int = 10): DataFrame = {
    import graft.functions.Dedup
    import org.apache.spark.sql.types._
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val spark = docs.sparkSession
    val fs = new org.apache.hadoop.fs.Path(lineStatePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lkSchema = new StructType().add("__lk", LongType)
    def tableOrEmpty(path: String, schema: StructType) =
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        spark.read.schema(schema.add("batch", LongType)).parquet(path)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema.add("batch", LongType))
    // strip against frozen ∪ promoted-before-now: STRICTLY earlier
    // epochs only (batch < batchId, not just != batchId) — this is the
    // stated promotion-at-N-strips-only-LATER contract, and it makes a
    // replayed epoch N see exactly its first attempt's view even when
    // higher-id epochs have since committed (an id-N rerun beside a
    // persisted epoch N+1 must not strip against "future" promotions)
    val promoted = tableOrEmpty(s"$lineStatePath/promoted", lkSchema)
      .filter(col("batch") < batchId).select(col("__lk"))
    val keys = frozenKeys.fold(promoted)(fk =>
      fk.select(col("__lk")).unionByName(promoted))
    val stripped = Dedup.stripLinesByKeys(docs, keys, idCol, textCol)
      .localCheckpoint(false) // feeds the count pass AND the pipeline
    // epoch line counts over the POST-strip text
    val bl = stripped
      .select(col(idCol), explode(split(col(textCol), "\n")).as("__line"))
      .filter(length(col("__line")) >= minLineChars)
      .groupBy(Dedup.hash60(col("__line")).as("__lk"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .localCheckpoint(false) // feeds the bounded collect + both writes
    val lks: Option[Array[String]] =
      KeySummaries.cappedDistinct(bl.select(col("__lk")),
        alreadyDistinct = true) // bl is a groupBy(__lk) output
    val countsRoot = s"$lineStatePath/counts"
    val prior = lks match {
      case Some(ks) =>
        val eps = KeySummaries.pruneEpochs(fs,
          listStateEpochs(fs, countsRoot).filter(_ < batchId), ks,
          m => new org.apache.hadoop.fs.Path(
            s"$lineStatePath/linesum/batch=$m"))
        val dirs = eps.map(m => s"$countsRoot/batch=$m")
          .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
        val cSchema = lkSchema.add("__nd", LongType).add("batch", LongType)
        if (dirs.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cSchema)
        else spark.read.option("basePath", countsRoot).schema(cSchema)
          .parquet(dirs: _*)
      case None => // over-cap batch: conservative full scan
        tableOrEmpty(countsRoot, lkSchema.add("__nd", LongType))
          .filter(col("batch") < batchId)
    }
    val priorAgg = prior.groupBy(col("__lk"))
      .agg(sum(col("__nd")).as("__ndp"))
    val newlyPromoted = bl.join(priorAgg, Seq("__lk"), "left")
      .filter(coalesce(col("__ndp"), lit(0L)) + col("__nd") >= minDocs)
      .select(col("__lk"))
    bl.select(col("__lk"), col("__nd")).coalesce(1)
      .write.mode("overwrite").parquet(s"$countsRoot/batch=$batchId")
    newlyPromoted.coalesce(1)
      .write.mode("overwrite")
      .parquet(s"$lineStatePath/promoted/batch=$batchId")
    lks.foreach(ks => KeySummaries.write(fs,
      new org.apache.hadoop.fs.Path(s"$lineStatePath/linesum/batch=$batchId"),
      KeySummaries.build(ks)))
    stripped
  }

  /**
   * Seed a [[nearDupDedupTo]] / [[prepPipelineTo]] dedup STATE from an
   * already-admitted corpus — the state twin of [[dedupIngestBootstrap]]:
   * a production pipeline usually starts streaming AGAINST an existing
   * deduped corpus, and replaying that corpus through the per-epoch
   * cascade just to populate the state would pay the full near-dup
   * verify for documents already known distinct. This writes the state
   * tables directly (admitting every corpus doc), in the same row shapes
   * and layout the streaming epochs write — banded sets, flat keys, one
   * [[KeySummaries]] Bloom per epoch — so the stream that takes over
   * cannot tell bootstrap epochs from its own.
   *
   * The corpus lands as MULTIPLE epochs of ~`epochDocs` docs under the
   * reserved NEGATIVE ids -1..-E (micro-batch ids start at 0, so no
   * collision, and the verify's own-epoch exclusion is unaffected):
   * bounded epochs keep every epoch's key count under the summary cap,
   * so the per-epoch pruning works over the bootstrap corpus exactly as
   * over streamed epochs — one giant epoch would exceed the cap,
   * carry no summary, and be rescanned forever. Epoch assignment is a
   * deterministic id hash; both tables write in ONE pass each
   * (partitioned by epoch), then the summaries in one bounded collect
   * per epoch against the just-written epoch partitions.
   *
   * Requires a FRESH `statePath` (single-writer, no stream attached) —
   * the same no-mixed-layout rule as [[dedupIngestBootstrapPartitioned]].
   * Returns the epoch count.
   */
  def nearDupStateBootstrap(corpus: DataFrame, statePath: String,
                            idCol: String, textCol: String,
                            epochDocs: Int = 60000): Int = {
    import graft.functions.{Dedup, LayoutMarker}
    require(epochDocs > 0, s"epochDocs must be positive: $epochDocs")
    val spark = corpus.sparkSession
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.functions.TopKAgg.requireIntegralId(corpus, idCol,
      "nearDupStateBootstrap")
    for (t <- Seq("sets", "keys"))
      require(!fs.exists(new org.apache.hadoop.fs.Path(s"$statePath/$t")),
        s"nearDupStateBootstrap: $statePath already holds a '" + t +
          "' table — bootstrap a fresh path")
    val nDocs = corpus.count()
    val epochs = math.max(1L, (nDocs + epochDocs - 1) / epochDocs).toInt
    // deterministic spread over -1..-epochs; uniform by hash, so each
    // epoch stays ~epochDocs and under the summary cap
    val epochCol =
      (-pmod(xxhash64(col(idCol)), lit(epochs.toLong)) - 1L).as("batch")
    val sets = Dedup.shingleSets(corpus, idCol, textCol)
      .localCheckpoint(false)
    sets.withColumn("batch", epochCol)
      .withColumn("ib", idBucket(col(idCol), StateSetBuckets))
      .repartition(epochs * StateSetBuckets, col("batch"), col("ib"))
      // id-sorted within each (batch, ib) file: the writer's required
      // ordering (the partition cols) is a satisfied prefix, so no
      // re-sort destroys it — row-group id stats then let the verify's
      // candidate-range filter skip row groups (dedupEpoch)
      .sortWithinPartitions(col("batch"), col("ib"), col(idCol))
      .write.mode("errorifexists").partitionBy("batch", "ib")
      .parquet(s"$statePath/sets")
    Dedup.bandKeysFromSets(sets, idCol)
      .withColumn("batch", epochCol)
      .repartition(epochs, col("batch"))
      .write.mode("errorifexists").partitionBy("batch")
      .parquet(s"$statePath/keys")
    // marker BEFORE the summaries (matches resolveStateLayout: tables
    // present + marker present = banded); a crash mid-summaries leaves
    // summary-less epochs = always-read, correct
    LayoutMarker.write(fs, stateLayoutPath(statePath), "ibsets|",
      StateSetBuckets)
    // a stream that previously ran against this path in THIS JVM may
    // have cached None (legacy/opted-out); the bootstrap just made the
    // path banded, so drop the entry — same discipline as
    // [[migrateStateToPartitioned]]
    stateLayoutCache.remove(statePath)
    val keysTable = spark.read.parquet(s"$statePath/keys")
    for (e <- 1 to epochs)
      KeySummaries.writeIfBounded(fs, keySummaryPath(statePath, -e.toLong),
        keysTable.filter(col("batch") === -e.toLong).select(col("bkey")))
    epochs
  }

  /**
   * Migrate a LEGACY (flat-sets) streaming dedup state to the banded
   * layout IN PLACE — the state twin of
   * [[graft.functions.Dedup.migrateToPartitionedIndex]]: a marker-less
   * state stays flat forever by design (mixing layouts under one
   * partition root breaks every read), which previously meant a
   * long-lived legacy state could only adopt the banded layout by a
   * full rebuild. Run with the STREAM STOPPED (single-writer).
   *
   * Only the `sets` table changes shape (each epoch's rows gain `ib=`
   * bucket dirs inside their `batch=` partition); `keys` is flat in
   * both layouts and the [[KeySummaries]] files describe keys, so both
   * survive untouched. Crash-safe the same two-layer way as the index
   * migration: [[graft.functions.ParquetCompact]] recovery runs before
   * the precondition reads, the rewrite itself is the staged swap, the
   * marker lands LAST (a flat read of an already-banded tree is
   * harmless; the banded path never engages before the marker exists),
   * and a re-run after any crash window detects the half-migrated
   * shape (sets already carry `ib`, marker absent) and resumes at the
   * marker write — verifying the on-disk bucketing matches
   * `setBuckets` first. The per-JVM layout cache entry is invalidated
   * so a stream restarted in the SAME JVM sees the banded layout.
   *
   * Returns the sets row count.
   */
  def migrateStateToPartitioned(spark: org.apache.spark.sql.SparkSession,
                                statePath: String,
                                setBuckets: Int = StateSetBuckets): Long = {
    import graft.functions.{LayoutMarker, ParquetCompact}
    require(setBuckets > 0, s"setBuckets must be positive: $setBuckets")
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(LayoutMarker.read(fs, stateLayoutPath(statePath), "ibsets|",
      "dedup-state").isEmpty, s"state at $statePath is already banded")
    val setsPath = s"$statePath/sets"
    ParquetCompact.recoverTable(spark, setsPath)
    require(fs.exists(new org.apache.hadoop.fs.Path(setsPath)),
      s"no sets table at $statePath — nothing to migrate")
    val cols = spark.read.parquet(setsPath).columns
    val idCol = cols.filterNot(c =>
      c == "sset" || c == "ib" || c == "batch").head
    val n =
      if (cols.contains("ib")) {
        // resume after a crash between the rewrite and the marker write:
        // verify the crashed attempt used the same bucket count
        val sets = spark.read.parquet(setsPath)
        require(sets.filter(
          idBucket(col(idCol), setBuckets) =!= col("ib")).isEmpty,
          s"half-migrated sets at $statePath were bucketed with a " +
            s"different setBuckets than $setBuckets — resume with the " +
            "original count")
        sets.count()
      } else
        ParquetCompact.rewritePartitionedMulti(spark, setsPath,
          Seq("batch", "ib")) { df =>
          df.withColumn("ib", idBucket(col(idCol), setBuckets))
            .repartition(col("batch"), col("ib"))
        }
    LayoutMarker.write(fs, stateLayoutPath(statePath), "ibsets|", setBuckets)
    stateLayoutCache.remove(statePath)
    n
  }

  /**
   * GROUPED state compaction — the 100 TB form of [[compactState]].
   * Full compaction consolidates everything into one `batch=-1`
   * partition, which carries no [[KeySummaries]] Bloom (its key count is
   * over the cap by definition at scale) and is therefore ALWAYS read:
   * one full compaction and the per-epoch keys pruning is gone — every
   * later epoch scans the whole consolidated corpus again. This
   * consolidates the POSITIVE (streamed) epochs into GROUPS of at most
   * `maxGroupKeys` distinct band keys instead, each landing as one new
   * negative-id epoch with ONE file per table and a REBUILT Bloom
   * summary — so the small-file population drops by the grouping factor
   * while a no-candidate batch still reads zero state bytes. By default
   * existing negative epochs (bootstrap epochs, prior groups) are left
   * alone and repeated cycles stack further groups below them,
   * LSM-fashion — so over MANY cycles the group population itself grows
   * (one-plus groups per cycle). `regroup = true` bounds that: the plan
   * then also folds in the SUMMARIZED negative epochs (prior groups and
   * bootstrap epochs — over-cap epochs carry no summary and are left
   * alone, rewriting them buys nothing), merging adjacent under-cap
   * groups up to `maxGroupKeys`, with no-op singletons (an
   * already-consolidated negative with no mergeable neighbor) dropped
   * from the plan so nothing is rewritten pointlessly. Merging
   * summarized epochs is admission-preserving for the same reason
   * grouping positives is: the merged epoch's rebuilt Bloom covers
   * exactly the union of its sources' keys.
   *
   * Run OFFLINE (stream stopped, single-writer), and after a CRASH
   * re-run THIS before restarting the stream — the same contract as
   * [[compactState]]: the grouping plan is written first (atomic
   * rename) and re-read by a re-run, so the assignment cannot drift
   * mid-recovery; each group commits through a manifest naming its
   * source epochs with staged tables swapped in only after both stages
   * complete (incomplete stages are discarded, complete ones roll
   * forward); summaries write after the group lands; the plan is
   * deleted last. Every window re-runs to the identical end state.
   *
   * Returns per-table row counts (whole tables, post-compaction).
   */
  /** Pure grouping arithmetic of [[compactStateGrouped]]: fold
    * `candidates` (in order) into groups whose per-epoch distinct-key
    * counts sum to ≤ `cap`, assigning strictly-decreasing gids from
    * `firstGid`. An epoch whose own count exceeds the cap becomes a
    * singleton group (a pure rewrite — its summary is dropped and it is
    * read forever after, the conservative over-cap contract). Negative
    * singletons (an already-consolidated group with no mergeable
    * neighbor) are dropped as no-ops so a re-run rewrites nothing.
    * Factored out for direct property coverage (Round11Properties). */
  private[graft] def planGroups(candidates: Seq[Long],
                                counts: Map[Long, Long],
                                cap: Long, firstGid: Long)
      : Seq[(Long, Seq[Long])] = {
    var gid = firstGid
    val groups = Seq.newBuilder[(Long, Seq[Long])]
    var cur = Seq.newBuilder[Long]
    var curN = 0L
    var curEmpty = true
    def flush(): Unit = if (!curEmpty) {
      groups += ((gid, cur.result())); gid -= 1L
      cur = Seq.newBuilder[Long]; curN = 0L; curEmpty = true
    }
    candidates.foreach { e =>
      val n = counts.getOrElse(e, 0L)
      if (!curEmpty && curN + n > cap) flush()
      cur += e; curN += n; curEmpty = false
      if (curN > cap) flush() // over-cap singleton
    }
    flush()
    // drop no-op singletons: an already-consolidated negative with no
    // mergeable neighbor (gid gaps are harmless)
    groups.result().filterNot { case (_, es) =>
      es.lengthCompare(1) == 0 && es.head < 0L
    }
  }

  def compactStateGrouped(spark: org.apache.spark.sql.SparkSession,
                          statePath: String,
                          maxGroupKeys: Int = KeySummaries.MaxKeys,
                          regroup: Boolean = false)
      : Map[String, Long] = {
    import org.apache.hadoop.fs.Path
    import graft.functions.LayoutMarker
    require(maxGroupKeys > 0, s"maxGroupKeys must be positive: $maxGroupKeys")
    val fs = new Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keysRoot = s"$statePath/keys"
    val setsRoot = s"$statePath/sets"
    val banded = LayoutMarker.read(fs, stateLayoutPath(statePath),
      "ibsets|", "dedup-state")
    val planPath = new Path(s"$statePath/__group_plan")

    def writeAtomic(p: Path, content: String): Unit =
      LayoutMarker.replaceWith(fs, p, "group plan")(
        _.write(content.getBytes("UTF-8")))
    def readLines(p: Path): Seq[String] = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in).getLines().toList
      finally in.close()
    }

    // ---- the grouping plan: compute once, honor across re-runs -------
    val plan: Seq[(Long, Seq[Long])] =
      if (fs.exists(planPath))
        readLines(planPath).filter(_.nonEmpty).map { ln =>
          val Array(g, es) = ln.split(":", 2)
          (g.toLong, es.split(",").filter(_.nonEmpty).map(_.toLong).toSeq)
        }
      else {
        val existing = listStateEpochs(fs, keysRoot)
        val positives = existing.filter(_ >= 0L).sorted
        // regroup: prior groups + bootstrap epochs join the plan — but
        // only SUMMARIZED ones (a summary-less negative is known over
        // the cap; it would come back as an over-cap singleton, a pure
        // rewrite). Sorted ascending = most-negative (NEWEST gids)
        // first; merge adjacency is cosmetic — Bloom-union merging is
        // order-independent.
        val regroupables =
          if (!regroup) Seq.empty[Long]
          else existing.filter(e => e < 0L &&
            fs.exists(keySummaryPath(statePath, e))).sorted
        val candidates = regroupables ++ positives
        // nothing can merge with fewer than two candidates — skip the
        // exact-count scan entirely (regroup's plan computation is
        // otherwise a read over every candidate's keys: counts must be
        // EXACT, because a merged group past the cap would lose its
        // summary and become always-read, worse than unmerged)
        if (candidates.isEmpty ||
          (positives.isEmpty && regroupables.sizeIs < 2)) Seq.empty
        else {
          val counts = spark.read
            .option("basePath", keysRoot)
            .parquet(candidates.map(e => s"$keysRoot/batch=$e"): _*)
            .groupBy(col("batch").cast("long").as("batch"))
            .agg(count_distinct(col("bkey")).as("n"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val p = planGroups(candidates, counts, maxGroupKeys.toLong,
            math.min(0L, existing.minOption.getOrElse(0L)) - 1L)
          if (p.nonEmpty)
            writeAtomic(planPath,
              p.map { case (g, es) => s"$g:${es.mkString(",")}" }
                .mkString("\n"))
          p
        }
      }

    // ---- per-group commit protocol ----------------------------------
    for ((gid, eps) <- plan) {
      val manifest = new Path(s"$statePath/__group_manifest_$gid")
      val keysStage = new Path(s"$keysRoot.__gstage_$gid")
      val setsStage = new Path(s"$setsRoot.__gstage_$gid")
      val keysTarget = new Path(s"$keysRoot/batch=$gid")
      val setsTarget = new Path(s"$setsRoot/batch=$gid")
      def rollForward(): Unit = {
        eps.foreach { e =>
          fs.delete(new Path(s"$keysRoot/batch=$e"), true)
          fs.delete(new Path(s"$setsRoot/batch=$e"), true)
          fs.delete(keySummaryPath(statePath, e), false)
        }
        if (fs.exists(keysStage)) {
          fs.delete(keysTarget, true)
          require(fs.rename(keysStage, keysTarget),
            s"group $gid: rename $keysStage failed")
        }
        if (fs.exists(setsStage)) {
          fs.delete(setsTarget, true)
          require(fs.rename(setsStage, setsTarget),
            s"group $gid: rename $setsStage failed")
        }
        fs.delete(manifest, false)
      }
      // recovery: the manifest is written only AFTER both stages are
      // complete, so a present manifest ALWAYS rolls forward (the roll
      // skips any stage a prior attempt already renamed in — judging
      // stage completeness here instead would discard a staged table
      // whose sibling was already renamed, losing its rows); stages
      // without a manifest are incomplete and redo from the intact
      // sources
      if (fs.exists(manifest)) rollForward()
      else if (fs.exists(keysStage) || fs.exists(setsStage)) {
        fs.delete(keysStage, true); fs.delete(setsStage, true)
      }
      val srcKeys = eps.map(e => s"$keysRoot/batch=$e")
        .filter(d => fs.exists(new Path(d)))
      if (srcKeys.nonEmpty) { // not yet consolidated by a prior run
        spark.read.option("basePath", keysRoot)
          .parquet(srcKeys: _*).drop("batch")
          .coalesce(1).write.parquet(keysStage.toString)
        val srcSets = eps.map(e => s"$setsRoot/batch=$e")
          .filter(d => fs.exists(new Path(d)))
        if (srcSets.nonEmpty) banded match {
          case Some(b) =>
            val grp = spark.read.option("basePath", setsRoot)
              .parquet(srcSets: _*).drop("batch")
            val idc = grp.columns
              .filterNot(c => c == "sset" || c == "ib").head
            grp.repartition(Dedup.writeTasks(grp, b), col("ib"))
              // id-sorted row groups, as the bootstrap writes them — the
              // verify's candidate-range pushdown survives compaction
              .sortWithinPartitions(col("ib"), col(idc))
              .write.partitionBy("ib").parquet(setsStage.toString)
          case None =>
            spark.read.option("basePath", setsRoot)
              .parquet(srcSets: _*).drop("batch")
              .coalesce(1).write.parquet(setsStage.toString)
        }
        writeAtomic(manifest, eps.mkString("\n"))
        rollForward()
      }
      // the group's summary, from its own consolidated keys (bounded by
      // maxGroupKeys unless this is an over-cap singleton → none, the
      // conservative always-read default)
      val sumPath = keySummaryPath(statePath, gid)
      if (fs.exists(keysTarget) && !fs.exists(sumPath))
        KeySummaries.writeIfBounded(fs, sumPath,
          spark.read.parquet(keysTarget.toString).select(col("bkey")))
    }
    if (fs.exists(planPath)) fs.delete(planPath, false)
    KeySummaries.invalidate(s"$statePath/keysum")
    def count(root: String): Long =
      if (fs.exists(new Path(root)))
        spark.read.parquet(root).count()
      else 0L
    Map("keys" -> count(keysRoot), "sets" -> count(setsRoot))
  }

  /**
   * Compact [[nearDupDedupTo]]'s append-only state: every epoch adds a
   * `batch=<id>` partition to the keys and sets tables, so a long-lived
   * ingest stream accumulates thousands of small files — the classic
   * streaming-state small-file problem. This rewrites each table into
   * the single reserved `batch=-1` partition (micro-batch ids start at
   * 0, so -1 never collides, and the epoch-exclusion filter
   * `batch =!= currentId` keeps treating it as prior state).
   *
   * Run OFFLINE (no concurrent stream on this state). Uses the same
   * crash-safe staged swap as every other epoch consolidation here
   * ([[consolidateEpochs]]): the round-7 overwrite-then-delete shape
   * could leave every state row twice on a crash between the two steps,
   * and a re-run baked the duplicates into `batch=-1` permanently —
   * merely *mostly* harmless for this state (admissions survive the
   * candidate-join distinct, but the tables grow for good and every
   * verify join does duplicated work thereafter).
   *
   * Returns per-table compacted row counts (0 when nothing to compact).
   */
  def compactState(spark: org.apache.spark.sql.SparkSession,
                   statePath: String): Map[String, Long] = {
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a banded state's sets must compact INTO the banded layout (one
    // file per ib dir inside the reserved batch=-1), or the next epoch
    // would read a mixed tree; keys are flat in both layouts
    val banded = graft.functions.LayoutMarker.read(fs,
      stateLayoutPath(statePath), "ibsets|", "dedup-state")
    def stageSets(df: DataFrame, stageDir: String): Unit = banded match {
      case Some(b) =>
        df.repartition(Dedup.writeTasks(df, b), col("ib"))
          .write.partitionBy("ib").parquet(stageDir)
      case None => df.coalesce(8).write.parquet(stageDir)
    }
    // the per-epoch band-key summaries describe the epoch layout this
    // rewrite is about to destroy — drop them BEFORE consolidating, so
    // a crash anywhere in the consolidation leaves no summary behind
    // (absent = always-read, conservative). Deleting AFTER would open a
    // window where a stale `batch=-1` summary (a bootstrap epoch or a
    // prior [[compactStateGrouped]] group at -1) describes only its OLD
    // keys while the consolidated batch=-1 holds the whole corpus — and
    // later epochs would silently Bloom-prune the entire state.
    // Post-compaction epochs resume summaries from their own writes.
    // NOTE the trade: full consolidation retires the epoch-level keys
    // pruning for the whole consolidated corpus — at scale prefer
    // [[compactStateGrouped]], which keeps bounded summarized groups
    val ks = new org.apache.hadoop.fs.Path(s"$statePath/keysum")
    if (fs.exists(ks)) { fs.delete(ks, true); () }
    KeySummaries.invalidate(s"$statePath/keysum")
    Map(
      "keys" -> consolidateEpochs(spark, s"$statePath/keys",
        epochPrefix = "batch=") { (df, stageDir) =>
        df.coalesce(8).write.parquet(stageDir)
      }.getOrElse(0L),
      "sets" -> consolidateEpochs(spark, s"$statePath/sets",
        epochPrefix = "batch=")(stageSets).getOrElse(0L))
  }

  /**
   * ONLINE maintenance of the persisted IVF index — the streaming twin of
   * [[graft.functions.Similarity.appendToIvfIndex]], with the epoch
   * idempotence the batch append cannot give (mode-append on a replayed
   * micro-batch would double its rows): each epoch's vectors land under
   * `lists/__batch=<epoch>/__cellkey=<cell>/` with OVERWRITE, so a
   * crash-replayed batch rewrites exactly its own epoch; then the cell
   * centers (the tiny table) are recomputed exactly from the on-disk
   * lists. A crash between the two writes leaves stale centers —
   * probe-correct under the OLD quantizer geometry, healed by the next
   * epoch's refresh (or a manual [[graft.functions.Similarity.refreshIvfCenters]]).
   *
   * The stream OWNS `indexPath`: the epoch layout nests `__cellkey` under
   * `__batch`, which cannot mix with [[Similarity.buildIvfIndex]]'s flat
   * cell layout in one directory tree (conflicting partition structure) —
   * seed a pre-existing corpus with [[ivfIngestBootstrap]] (the reserved
   * `__batch=-1`, micro-batch ids start at 0) instead of buildIvfIndex.
   * Probes via [[Similarity.ivfKnnJoinIndexed]] work unchanged: the extra
   * `__batch` partition column is ignored and `__cellkey` still prunes at
   * file listing whatever its nesting level.
   */
  def ivfIngestTo(vectors: DataFrame, indexPath: String, checkpoint: String,
                  idCol: String, vecCol: String, labelCol: String,
                  dims: Int = 64,
                  availableNow: Boolean = true,
                  compactEvery: Int = 0): StreamingQuery = {
    val writer = vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // periodic lists consolidation under the foreachBatch
        // single-writer fence, BEFORE the epoch write (the
        // phashIngestTo device): the fold state is a function of the
        // row SET, so the csums marker stays valid across the rewrite
        // and a crash-replayed epoch overwrites its own fresh dir —
        // UNLESS this epoch already landed (then this invocation is a
        // replay and the first attempt's compaction already folded the
        // earlier epochs; shouldCompactAt skips to avoid folding the
        // crashed attempt's own rows into -1 before they re-land)
        if (shouldCompactAt(batch.sparkSession, indexPath, batchId,
            compactEvery))
          compactIvfIngestState(batch.sparkSession, indexPath)
        ivfIngestEpoch(batch, batchId, indexPath, idCol, vecCol, labelCol,
          dims)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /**
   * [[ivfIngestTo]] with cells DERIVED from the index's own centers —
   * the streaming ingest for a k-means-quantized index, where arriving
   * vectors carry no label column (one batch × broadcast(K) assignment
   * step, no retrain), landing as epochs exactly like the labeled
   * ingest.
   *
   * Replay idempotence needs one extra device the labeled path doesn't:
   * a replayed batch must re-derive the SAME assignment, but the stored
   * centers move with every refresh — including the replayed epoch's own
   * first attempt (assign against post-refresh centers and a
   * boundary-straddling vector can flip cells, so the replay would write
   * different rows than the uninterrupted run). So the assignment-time
   * centers are recomputed from the on-disk lists EXCLUDING the current
   * epoch's own partition (`__batch =!= batchId` — the same
   * own-epoch-exclusion the dedup state verify uses): first attempt and
   * replay both see exactly the pre-epoch corpus, whatever the crash
   * point. Costs one column-pruned corpus scan per epoch — the same
   * shape the refresh half already pays.
   *
   * Bootstrap with [[ivfIngestBootstrap]] on a
   * [[graft.functions.Similarity.kmeansLabels]]-labeled corpus first
   * (the index must HAVE cells before anything can be assigned to them).
   */
  def ivfIngestAssignedTo(vectors: DataFrame, indexPath: String,
                          checkpoint: String, idCol: String, vecCol: String,
                          dims: Int = 64,
                          availableNow: Boolean = true,
                          maintainEvery: Int = 0,
                          residualThreshold: Double = 0.17,
                          skewThreshold: Double = Double.MaxValue,
                          targetRowsPerCell: Int = -1,
                          maintainIters: Int = 4,
                          superAssign: Int = -1,
                          maintainCellMod: Int = 1): StreamingQuery = {
    val writer = vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // ONLINE MAINTENANCE (round-15: the drift metrics and the
        // retrain lever existed but nothing in the ingest SCHEDULED
        // them, so a drifting stream degraded until an operator
        // intervened): every `maintainEvery` epochs, measure drift and
        // retrain on breach — inside the foreachBatch body, the one
        // place the stream is provably the only writer (the
        // maintainIvfIndex single-writer fence), and BEFORE this
        // epoch's write, so a crash-replayed epoch re-lands AFTER any
        // retrain consolidated the previous epochs (overwriting its
        // own dir, never duplicating into the consolidated corpus).
        // Residual hazard, documented: a replay whose re-measured
        // drift STILL breaches retrains again and re-duplicates one
        // epoch — bounded by a crash × persistent-breach coincidence.
        // The no-breach path is one bounded metrics pass per K epochs
        // (maintainCellMod > 1 prunes it to ~1/cellMod of the cell
        // dirs — the sampled-drift fast path for small K).
        if (maintainEvery > 0 && batchId > 0 &&
            batchId % maintainEvery == 0)
          Similarity.maintainIvfIndex(batch.sparkSession, indexPath,
            idCol, vecCol, "cell", dims,
            residualThreshold = residualThreshold,
            skewThreshold = skewThreshold,
            targetRowsPerCell = targetRowsPerCell, iters = maintainIters,
            superAssign = superAssign, epochLayout = true,
            cellMod = maintainCellMod)
        ivfIngestAssignedEpoch(batch, batchId, indexPath, idCol, vecCol,
          dims)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** One epoch of [[ivfIngestAssignedTo]] — factored out so the
    * replay-idempotence contract is directly testable: same
    * (batch, batchId) twice ≡ once, even with the crash point between
    * the lists write and the centers refresh.
    *
    * CENTERS REUSE (the round-8 verdict's per-epoch double-scan): the
    * assignment-time centers of epoch M are [[Similarity.cellCentersOf]]
    * over every epoch except M — which, on a clean run, is EXACTLY what
    * epoch N's refresh already computed and wrote (all epochs ≤ N). So
    * each completed epoch stamps an immutable copy of the refreshed
    * centers under `centers_epoch/__batch=N` plus a marker recording the
    * epoch set that copy covers, and epoch M reuses the copy IFF the
    * marker's set equals the on-disk epochs minus M. Bit-identity of the
    * reuse: the copy is the refresh's own parquet rows (doubles
    * round-trip exactly), and the fallback recompute folds the identical
    * epoch set with the identical order-free arithmetic. Every crash
    * window degrades to the recompute, never to a wrong assignment:
    *  - crash before the marker write (incl. mid-refresh, which may
    *    leave the LIVE centers table partial): the marker still names
    *    the previous epoch set; a replayed M sees on-disk minus M equal
    *    to that set and reuses the previous epoch's intact copy — the
    *    assignment the first attempt made. The live table is rewritten
    *    by the replay's refresh.
    *  - crash after the marker write but before the stream commits M:
    *    the marker now covers M itself, the match fails (the set
    *    includes M), and the replay recomputes from lists-minus-M —
    *    the same input set, so the same assignment.
    *  - compaction rewrites the epoch layout: the set mismatch falls
    *    back to recompute ([[compactIvfIngestState]] also clears the
    *    copies).
    * The marker is a single file written via temp + atomic rename, so a
    * present marker always names a COMPLETED copy. Returns whether the
    * stored copy was reused (false = full fallback recompute), so the
    * spec can assert the reuse engaged without plan introspection. */
  private[graft] def ivfIngestAssignedEpoch(batch: DataFrame, batchId: Long,
                                            indexPath: String, idCol: String,
                                            vecCol: String,
                                            dims: Int): Boolean = {
    val spark = batch.sparkSession
    val priorEpochs = listEpochs(spark, indexPath) - batchId
    val marker = readCentersMarker(spark, indexPath)
    val reuse = marker.exists(_._2 == priorEpochs)
    // assignment-time centers from every epoch EXCEPT this one (replay
    // sees the identical pre-epoch corpus; first attempt excludes
    // nothing it wrote yet)
    val centers =
      if (reuse)
        spark.read
          .parquet(s"$indexPath/centers_epoch/__batch=${marker.get._1}")
      else
        Similarity.cellCentersOf(
          spark.read.parquet(s"$indexPath/lists")
            .filter(col("__batch") =!= batchId)
            .select(col(idCol), col(vecCol), col("cell")),
          "cell", idCol, vecCol, dims)
    // EAGER: the epoch overwrite below rewrites partitions this lineage
    // reads (on replay, the epoch's own old files are excluded by the
    // filter but the scan still lists the tree)
    val labeled = batch.select(col(idCol), col(vecCol))
      .join(Similarity.assignAgainst(centers, batch, idCol, vecCol),
        Seq(idCol))
      .localCheckpoint()
    ivfIngestEpoch(labeled, batchId, indexPath, idCol, vecCol, "cell", dims)
    // stamp the refreshed centers for the NEXT epoch's reuse: immutable
    // per-epoch copy first (a replayed M overwrites only its own copy),
    // marker last (temp + atomic rename — present ⟹ copy complete)
    spark.read.parquet(s"$indexPath/centers")
      .write.mode("overwrite")
      .parquet(s"$indexPath/centers_epoch/__batch=$batchId")
    writeCentersMarker(spark, indexPath, batchId, priorEpochs + batchId)
    // only the marker's named copy is ever read — prune the rest, or a
    // long-running stream accumulates one dead K-row directory per
    // micro-batch (sustained small-file/namenode pressure at 10k
    // epochs). Pruning AFTER the rename is crash-safe: a crash mid-prune
    // leaves unreferenced copies the next completed epoch removes, and
    // every reuse decision consults only the marker's own copy.
    pruneCentersCopies(spark, indexPath, keep = batchId)
    reuse
  }

  /** Delete every `centers_epoch/__batch=N` copy except `keep` (the one
    * the marker names). */
  private def pruneCentersCopies(spark: org.apache.spark.sql.SparkSession,
                                 indexPath: String, keep: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(s"$indexPath/centers_epoch")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) {
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("__batch=") && n != s"__batch=$keep") {
          fs.delete(st.getPath, true); ()
        }
      }
    }
  }

  /** Epoch ids present under `lists/` (`__batch=N` directory names) —
    * a metadata-only FS listing, no data scan. */
  private def listEpochs(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String): Set[Long] = {
    val root = new org.apache.hadoop.fs.Path(s"$indexPath/lists")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("__batch=") =>
        n.stripPrefix("__batch=").toLongOption }
      .flatten.toSet
  }

  private def centersMarkerPath(indexPath: String) =
    new org.apache.hadoop.fs.Path(s"$indexPath/centers_epoch/__marker")

  /** (lastEpoch, covered epoch set) from the marker file, if present and
    * well-formed. Format: one line `lastEpoch|e1,e2,...`. */
  private def readCentersMarker(spark: org.apache.spark.sql.SparkSession,
                                indexPath: String): Option[(Long, Set[Long])] = {
    val p = centersMarkerPath(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else try {
      val in = fs.open(p)
      val raw = try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
      val Array(last, eps) = raw.split('|')
      Some((last.toLong,
        eps.split(',').filter(_.nonEmpty).map(_.toLong).toSet))
    } catch { case _: Throwable => None } // malformed → recompute path
  }

  private def writeCentersMarker(spark: org.apache.spark.sql.SparkSession,
                                 indexPath: String, lastEpoch: Long,
                                 epochs: Set[Long]): Unit = {
    val p = centersMarkerPath(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(p.toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"$lastEpoch|${epochs.toSeq.sorted.mkString(",")}".getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p), s"marker rename failed: $tmp -> $p")
  }

  /** One epoch of [[ivfIngestTo]] — factored out so the replay-idempotence
    * contract is directly testable: same (batch, batchId) twice ≡ once.
    *
    * The epoch's refresh runs through the csums fold state
    * ([[Similarity.streamingCsumsRefresh]], round 12): a monotone-id
    * micro-batch — the streaming norm: new documents get new ids —
    * continues the stored per-cell left folds in O(batch) instead of the
    * former full O(corpus) centers recompute per epoch; a replayed epoch
    * is recognized by the marker's epoch field (its lists partition was
    * rewritten with bit-identical rows) and only re-derives centers;
    * anything else rebuilds from the lists — exactly the old per-epoch
    * cost, never a wrong fold. Returns the refresh path taken (0 = fold,
    * 1 = replay skip/empty, 2 = rebuild) so specs can pin which ran. */
  private[graft] def ivfIngestEpoch(batch: DataFrame, batchId: Long,
                                    indexPath: String, idCol: String,
                                    vecCol: String, labelCol: String,
                                    dims: Int): Int = {
    val spark = batch.sparkSession
    // validate BEFORE the epoch partition lands (the batch twin's rule:
    // a ragged or null/empty-labeled batch must fail while the index is
    // untouched — written first, it would poison every later rebuild,
    // and even the manual repair would refuse the persisted rows)
    val stats = Similarity.csumsBatchStats(batch, idCol, vecCol, labelCol,
      dims, "ivfIngestEpoch")
    // EMPTY micro-batch (an idle trigger interval): short-circuit before
    // anything lands. The old path wrote a data-less __batch=N dir whose
    // read-back crashed schema inference — and since foreachBatch replays
    // the same empty batch on restart, the stream wedged on it forever.
    // Nothing written → index untouched → the replay-skip return.
    if (stats.isEmpty) return 1
    // epoch-id REUSE detection, sampled before the overwrite: a fresh
    // stream restarted against an old index (new checkpoint → batch ids
    // restart at 0) OVERWRITES an epoch partition whose old rows the
    // csums still cover — only a full rebuild can reconcile that; a
    // genuine crash-replay also overwrites, but with bit-identical rows
    // (streamingCsumsRefresh tells the two apart via the marker's
    // maxId)
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epochExisted = fs.exists(new org.apache.hadoop.fs.Path(
      s"$indexPath/lists/__batch=$batchId"))
    batch.select(col(idCol), col(vecCol), col(labelCol),
        Similarity.norm(col(vecCol)).as("__cn"),
        col(labelCol).cast("string").as("__cellkey"))
      .write.mode("overwrite").partitionBy("__cellkey")
      .parquet(s"$indexPath/lists/__batch=$batchId")
    // the refresh folds what actually LANDED: reading the epoch
    // partition back (batch-sized) makes the fold consistent with the
    // lists by construction — no second evaluation of the caller's
    // frame, no corpus-sized checkpoint on the bootstrap path
    if (!Similarity.hasParquetData(spark,
        s"$indexPath/lists/__batch=$batchId")) {
      // stats said non-empty but zero rows landed: a non-deterministic
      // frame. Nothing to fold; but if the overwrite wiped a pre-existing
      // epoch's rows, the csums no longer cover the lists — rebuild.
      if (epochExisted) {
        Similarity.rebuildIvfCsums(spark, indexPath, idCol, vecCol,
          labelCol, dims, epoch = Some(batchId))
        return 2
      }
      return 1
    }
    val landed = spark.read
      .parquet(s"$indexPath/lists/__batch=$batchId")
      .select(col(idCol), col(vecCol), col(labelCol))
    Similarity.streamingCsumsRefresh(spark, indexPath, landed,
      batchId, idCol, vecCol, labelCol, dims, epochExisted)
  }

  /**
   * [[ivfIngestTo]] with a PQ sidecar kept fresh per epoch — the
   * streaming half of the IVF-PQ lifecycle. Each micro-batch runs the
   * unchanged [[ivfIngestEpoch]] (same validation, same epoch-overwrite
   * idempotence, same csums refresh), then encodes WHAT LANDED in the
   * epoch's lists partition against the STORED codebooks (one narrow
   * map) into the mirrored `pq/codes/__batch=N` tree: a crash replay
   * overwrites the whole epoch dir with bit-identical rows, and a
   * reused epoch id with DIFFERENT rows replaces its codes wholesale —
   * no orphan codes, the hazard a delta-append layout would carry. The
   * pq marker is deleted FIRST and re-stamped LAST from the post-epoch
   * csums marker, so every crash window leaves the sidecar refusing
   * probes instead of silently missing the epoch. Bootstrap:
   * [[ivfIngestBootstrap]] then
   * [[graft.functions.Similarity.addPqToIvfIndex]] (it mirrors the
   * epoch layout automatically).
   */
  def ivfPqIngestTo(vectors: DataFrame, indexPath: String,
                    checkpoint: String, idCol: String, vecCol: String,
                    labelCol: String, dims: Int = 64,
                    availableNow: Boolean = true,
                    compactEvery: Int = 0): StreamingQuery = {
    val writer = vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // periodic LISTS consolidation (see ivfIngestTo, including the
        // shouldCompactAt replay skip): the codes sidecar keeps its
        // per-epoch dirs (they ARE its replay device) and the pq
        // marker stays valid — the fold state, and hence the csums
        // marker it mirrors, is a function of the row set the rewrite
        // preserves
        if (shouldCompactAt(batch.sparkSession, indexPath, batchId,
            compactEvery))
          compactIvfIngestState(batch.sparkSession, indexPath)
        ivfPqIngestEpoch(batch, batchId, indexPath, idCol, vecCol,
          labelCol, dims)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  private[graft] def ivfPqIngestEpoch(batch: DataFrame, batchId: Long,
                                      indexPath: String, idCol: String,
                                      vecCol: String, labelCol: String,
                                      dims: Int): Int = {
    val spark = batch.sparkSession
    val pqm = Similarity.readPqMarker(spark, indexPath).getOrElse(
      throw new IllegalStateException(s"ivfPqIngestEpoch: no valid PQ " +
        s"sidecar under $indexPath — bootstrap with ivfIngestBootstrap " +
        "+ addPqToIvfIndex first"))
    val (_, m, ksub, pqDims, residual) = pqm
    require(pqDims == dims, s"pq sidecar dims $pqDims != $dims")
    Similarity.deletePqMarker(spark, indexPath)
    val r = ivfIngestEpoch(batch, batchId, indexPath, idCol, vecCol,
      labelCol, dims)
    val epochLists = s"$indexPath/lists/__batch=$batchId"
    if (Similarity.hasParquetData(spark, epochLists)) {
      val landed = spark.read.parquet(epochLists)
        .select(col(idCol), col(vecCol), col(labelCol))
      // residual sidecars encode against the FROZEN snapshot centers
      // (Similarity.residualized's contract) — the epoch just moved the
      // live centers, but decode geometry is pinned at addPq time. A
      // cell BORN this epoch gets its first-seen center frozen in
      // first (extendPqSnapshot — idempotent across crash replays), so
      // its codes are residual on the codebooks' scale
      val encodeRows =
        if (!residual) landed
        else {
          Similarity.extendPqSnapshot(spark, indexPath,
            landed.select(col(labelCol).cast("string")).distinct()
              .collect().map(_.getString(0)).toIndexedSeq)
          Similarity.residualizedRows(landed,
            spark.read.parquet(s"$indexPath/pq/centers"), vecCol,
            labelCol)
        }
      val cb = spark.read.parquet(s"$indexPath/pq/codebooks")
      Similarity.pqEncodeCells(encodeRows, cb, idCol, vecCol, labelCol,
        m, ksub, dims)
        .write.mode("overwrite").partitionBy("__cellkey")
        .parquet(s"$indexPath/pq/codes/__batch=$batchId")
    }
    // restamp only from a PRESENT csums marker: an absent one means the
    // refresh itself is mid-crash — leave the sidecar refusing too
    Similarity.readCsumsMarker(spark, indexPath).foreach {
      case (maxId, _, _, _) =>
        Similarity.writePqMarker(spark, indexPath, maxId, m, ksub, dims,
          residual)
    }
    r
  }

  /** Seed [[ivfIngestTo]]'s index with a pre-existing corpus: the corpus
    * lands in the reserved `__batch=-1` epoch (micro-batch ids start at
    * 0), keeping the partition structure uniform for the stream that
    * takes over. */
  def ivfIngestBootstrap(corpus: DataFrame, indexPath: String,
                         idCol: String, vecCol: String, labelCol: String,
                         dims: Int = 64): Unit =
    ivfIngestEpoch(corpus, -1L, indexPath, idCol, vecCol, labelCol, dims)

  /**
   * Compact [[ivfIngestTo]]'s epoch partitions — same small-file problem
   * and same device as [[compactState]]: every epoch adds one directory
   * per touched cell, and a long-lived ingest accumulates thousands of
   * small files. Consolidates every epoch into the reserved `__batch=-1`
   * partition, one file per cell directory, preserving `__cellkey`
   * pruning. Run OFFLINE (single-writer, like the batch appends). Centers
   * are unchanged (same rows, same fold). Returns the lists row count.
   */
  /** Periodic-compaction gate for the streaming ingests: compact at
    * every `compactEvery`-th epoch EXCEPT when that epoch's partition is
    * already on disk. Inside the foreachBatch single-writer fence an
    * existing `__batch=<batchId>` dir means this invocation is a crash
    * REPLAY (or an epoch-id reuse, which the epoch writers reconcile
    * themselves) — and the first attempt's compaction already ran.
    * Running it again would fold the crashed attempt's own `__batch=N`
    * rows into the consolidated `__batch=-1` right before the epoch
    * write re-lands the same rows under `__batch=N`, duplicating every
    * row of the epoch: duplicate ids surfacing in IVF probe top-k,
    * silent index inflation for the phash family (round-15 advice — the
    * "crash-replayed epoch overwrites its own fresh dir" idempotence
    * argument does not hold once compaction has folded that dir away).
    * Skipping merely defers consolidation to the next boundary; it never
    * loses data. `nested` selects the layout probe: the phash indexes
    * nest epoch dirs INSIDE their `pb=` dirs, IVF lists keep them at
    * `lists/` top level. Metadata-only FS listing, no data scan. */
  private[graft] def shouldCompactAt(spark: org.apache.spark.sql.SparkSession,
                                     indexPath: String, batchId: Long,
                                     compactEvery: Int,
                                     nested: Boolean = false): Boolean = {
    if (compactEvery <= 0 || batchId <= 0 || batchId % compactEvery != 0)
      return false
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val replayed =
      if (!nested)
        fs.exists(new org.apache.hadoop.fs.Path(
          s"$indexPath/lists/__batch=$batchId"))
      else fs.exists(root) && fs.listStatus(root).exists { st =>
        st.isDirectory && st.getPath.getName.startsWith("pb=") &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath,
            s"__batch=$batchId"))
      }
    !replayed
  }

  def compactIvfIngestState(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String): Long = {
    // the per-epoch centers copies key on the exact epoch layout this
    // rewrite destroys — drop them (and the marker) so the next assigned
    // epoch takes the safe recompute path instead of a stale-set match
    val ce = new org.apache.hadoop.fs.Path(s"$indexPath/centers_epoch")
    val fs = ce.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(ce)) { fs.delete(ce, true); () }
    // one task per cell keeps one file per cell directory
    consolidateEpochs(spark, s"$indexPath/lists") { (df, stageDir) =>
      df.repartition(col("__cellkey"))
        .write.partitionBy("__cellkey").parquet(stageDir)
    }.getOrElse {
      // nothing to consolidate (possibly because recovery just rolled a
      // crashed compaction forward) — report the live count
      val root = new org.apache.hadoop.fs.Path(s"$indexPath/lists")
      if (fs.exists(root)) spark.read.parquet(root.toString).count() else 0L
    }
  }

  /**
   * Streaming cross-corpus dedup against a FROZEN persisted index
   * ([[graft.functions.Dedup.buildDedupIndex]] /
   * [[dedupIngestTo]] layout): each micro-batch probes the index
   * ([[graft.functions.Dedup.dedupAgainstIndexed]] — band-key-bucketed
   * candidates, exact-Jaccard verify, never corpus × batch) and every
   * doc lands with its verdict (`dup_of`, `jac`, `admitted`). This is
   * the "dedupe the new crawl against the already-trained corpus" pass:
   * the index is NOT mutated by the stream — unlike [[nearDupDedupTo]],
   * whose state grows with each admission — so batches are independent
   * and replay idempotence needs only the epoch overwrite. Compose with
   * [[nearDupDedupTo]] downstream for "new-vs-corpus AND new-vs-new".
   *
   * Per-batch cost is the batch's own shingling plus bucket-local joins
   * against the prebuilt key/set tables. The scale shape depends on the
   * index layout (sniffed once at stream start):
   *
   *  - PARTITIONED index ([[graft.functions.Dedup.buildDedupIndexPartitioned]],
   *    the 100 TB layout): each micro-batch probes via the partition-
   *    pruned path — only the batch's own band-prefix dirs of `keys` and
   *    candidate id-buckets of `sets` are read from disk — so NOTHING
   *    corpus-proportional is pinned in cluster storage, the same
   *    build-once / probe-many contract as [[annProbeTo]]'s pruned IVF
   *    probes. The index files are re-resolved per batch, so the frozen-
   *    index contract is load-bearing here exactly as for [[annProbeTo]]:
   *    no concurrent append/compact on the path while the stream runs.
   *  - FLAT index ([[graft.functions.Dedup.buildDedupIndex]], small
   *    corpora): every probe needs the whole key/set tables, so they are
   *    loaded + materialized ONCE per query (the [[lmScoreTo]]
   *    pre-stream-build pattern), not re-listed from parquet every
   *    micro-batch; this also pins one index snapshot for the life of
   *    the stream. The snapshot is held at `DISK_ONLY_2` (not
   *    `localCheckpoint`): a localCheckpoint TRUNCATES lineage into
   *    non-replicated executor blocks, so one executor loss would make
   *    the corpus-scale snapshot unrecoverable and fail every later
   *    micro-batch of a long-running stream. persist keeps the parquet
   *    lineage (the file listing is captured at read time, so a
   *    recompute still sees this snapshot's files) and 2-replicates the
   *    blocks, surviving single-executor loss without a recompute.
   *
   * Duplicate ids WITHIN a micro-batch (at-least-once upstream, a
   * crawler re-emitting a page) are collapsed to one row before the
   * probe — without that, the verdict join would multiply copies
   * (n copies × n verdict rows) instead of emitting one verdict per id.
   */
  def crossDedupTo(docs: DataFrame, indexPath: String, outPath: String,
                   checkpoint: String, idCol: String, textCol: String,
                   minJaccard: Double = 0.8,
                   availableNow: Boolean = true): StreamingQuery = {
    import graft.functions.Dedup
    val spark = docs.sparkSession
    val partitioned = Dedup.readDedupLayout(spark, indexPath).isDefined
    val (cKeys, cSets) =
      if (partitioned) (null, null) // pruned per-batch reads instead
      else {
        val k = spark.read.parquet(s"$indexPath/keys")
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY_2)
        val s = spark.read.parquet(s"$indexPath/sets")
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY_2)
        k.count(); s.count() // eager: materialize before the stream
        (k, s)
      }
    val writer = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // checkpointed: the batch feeds the probe (shingling + two
        // bounded collects on the pruned path) AND the final verdict
        // join — one evaluation keeps them consistent even over a
        // nondeterministic upstream transform
        val b = batch.dropDuplicates(idCol).localCheckpoint(false)
        val verdicts =
          if (partitioned)
            Dedup.dedupAgainstIndexed(spark, indexPath, b, idCol, textCol,
              minJaccard)
          else Dedup.dedupAgainstTables(b, cKeys, cSets, idCol, textCol,
            minJaccard)
        b.join(verdicts, Seq(idCol))
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /**
   * Streaming ANN retrieval against a FROZEN persisted IVF index — the
   * embedding twin of [[crossDedupTo]]: each micro-batch of (id, vector)
   * probes the index ([[graft.functions.Similarity.ivfKnnJoinIndexed]])
   * and lands its top-k neighbors `(probe_id, rank, neighbor_id, cos)`
   * under `outPath/batch=N` — the "retrieve context for every arriving
   * query/document from the trained corpus" pass. The index is NOT
   * mutated by the stream (ingest is [[ivfIngestTo]] /
   * [[ivfIngestAssignedTo]], on a path this stream must not race), so
   * batches are independent and the epoch overwrite alone gives replay
   * idempotence.
   *
   * Scale shape: unlike [[crossDedupTo]] — whose bucket joins need the
   * whole key/set tables, pinned once in replicated storage — the IVF
   * probe's corpus access is partition-PRUNED to the probed cells'
   * directories, so nothing here preloads the corpus: each micro-batch
   * reads the K-row centers plus only its own probed cells from disk,
   * which is the index's build-once / probe-many contract working as
   * designed. `superProbe` defaults to the library's auto two-level rule
   * ([[graft.functions.Similarity.resolveSuperProbe]]).
   *
   * Probe ids share the index's id space semantics: a corpus row whose
   * id EQUALS the probe's id is excluded as "self" (the probe contract —
   * re-probing corpus members skips their own row). Use disjoint id
   * ranges if the stream's ids are unrelated to the corpus's. Duplicate
   * ids WITHIN a micro-batch collapse to one probe before scoring.
   */
  def annProbeTo(vectors: DataFrame, indexPath: String, outPath: String,
                 checkpoint: String, idCol: String, vecCol: String,
                 labelCol: String = "cell", k: Int = 5, nProbe: Int = 2,
                 superProbe: Int = -1,
                 availableNow: Boolean = true): StreamingQuery = {
    import graft.functions.Similarity
    val spark = vectors.sparkSession
    val writer = vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // checkpointed (mirrors embedDedupTo): the indexed probe
        // evaluates its probe frame twice (probed-cell collect +
        // scoring join) — without this a nondeterministic upstream
        // could yield inconsistent probed cells vs scored vectors
        val probes = batch.dropDuplicates(idCol)
          .select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
          .localCheckpoint(false)
        Similarity.ivfKnnJoinIndexed(spark, indexPath, probes, idCol,
          vecCol, labelCol, k, nProbe, superProbe)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /**
   * Streaming EMBEDDING cross-dedup against a frozen persisted IVF index
   * — [[crossDedupTo]]'s semantic-dup form: each arriving vector gets a
   * verdict row `(idCol, dup_of, cos, admitted)` — its best corpus
   * neighbor when that neighbor's cosine clears `minCos`
   * (`admitted = false`), else admitted with null `dup_of`/`cos` — the
   * SemDeDup admission decision ([[graft.functions.Similarity]]'s
   * semantic dedup family) run online against the trained corpus. Same
   * frozen-index/epoch-overwrite idempotence and pruned-probe scale
   * shape as [[annProbeTo]] (the verdict is derived from its k = 1
   * probe); a probe whose cells hold no corpus vectors (or a zero-norm
   * vector) yields no neighbor row and is admitted.
   */
  def embedDedupTo(vectors: DataFrame, indexPath: String, outPath: String,
                   checkpoint: String, idCol: String, vecCol: String,
                   labelCol: String = "cell", minCos: Double = 0.9,
                   nProbe: Int = 2, superProbe: Int = -1,
                   availableNow: Boolean = true): StreamingQuery = {
    import graft.functions.Similarity
    val spark = vectors.sparkSession
    val writer = vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.dropDuplicates(idCol).localCheckpoint(false)
        val best = Similarity.ivfKnnJoinIndexed(spark, indexPath,
          b.select(col(idCol).as("probe_id"), col(vecCol).as("__pv")),
          idCol, vecCol, labelCol, k = 1, nProbe, superProbe)
          .filter(col("cos") >= minCos)
          .select(col("probe_id").as(idCol),
            col("neighbor_id").as("dup_of"), col("cos"))
        b.join(best, Seq(idCol), "left")
          .withColumn("admitted", col("dup_of").isNull)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /**
   * Streaming PERCEPTUAL media dedup against a frozen persisted phash
   * index ([[graft.functions.Multimodal.buildPhashIndex]]) —
   * [[embedDedupTo]]'s media form: each arriving payload decodes,
   * hashes, and gets a verdict row `(doc_id, dup_of, hamming,
   * admitted)` — its NEAREST corpus near-dup within `maxHamming`
   * (smallest hamming, ties to the smallest corpus id) with
   * `admitted = false`, else admitted with null `dup_of`/`hamming`.
   * Undecodable payloads hash nothing and are admitted (quarantine is
   * the caller's policy — see [[graft.functions.Multimodal
   * .phashSignatures]]). Same frozen-index/epoch-overwrite idempotence
   * as [[annProbeTo]]; the probe reads only the batch's candidate pb
   * partitions with its bvals pushed to the scan — per-epoch bytes
   * bounded by the batch at any corpus size.
   */
  def phashDedupTo(media: DataFrame, indexPath: String, outPath: String,
                   checkpoint: String, maxHamming: Int = 3,
                   availableNow: Boolean = true): StreamingQuery = {
    import graft.functions.Multimodal
    val spark = media.sparkSession
    val writer = media.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.dropDuplicates("doc_id").localCheckpoint(false)
        val best = Multimodal.phashDedupAgainst(spark, indexPath, b,
          maxHamming)
          .groupBy(col("doc_id"))
          .agg(min(struct(col("hamming"), col("corpus_id"))).as("__b"))
          .select(col("doc_id"), col("__b.corpus_id").as("dup_of"),
            col("__b.hamming").as("hamming"))
        b.select(col("doc_id"), col("kind"), col("byte_len"))
          .join(best, Seq("doc_id"), "left")
          .withColumn("admitted", col("dup_of").isNull)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /**
   * ONLINE maintenance of the persisted phash index — the streaming
   * twin of [[graft.functions.Multimodal.appendToPhashIndex]], with the
   * epoch idempotence the batch append cannot give (mode-append on a
   * crash-replayed micro-batch would double its rows; duplicated index
   * rows are harmless to pair correctness — candidates re-distinct —
   * but grow the index and its probe cost without bound across
   * replays). Each epoch's exploded hash blocks land under
   * `pb=<dir>/__batch=<epoch>/` with DYNAMIC partition overwrite, so a
   * replayed batch rewrites exactly its own (pb, epoch) partitions —
   * the `__batch` dirs nest INSIDE the `pb` dirs (unlike the IVF/dedup
   * ingests' top-level epochs) because [[graft.functions.Multimodal
   * .phashDedupAgainst]] prunes by explicit `pb=` subdirectory listing,
   * which must keep resolving at the tree's first level.
   *
   * The stream OWNS `indexPath` (epoch subdirs cannot mix with the
   * batch build's flat files inside one `pb` dir): seed a pre-existing
   * corpus with [[phashIngestBootstrap]] (reserved `__batch=-1`;
   * micro-batch ids start at 0). Probes work unchanged — the extra
   * `__batch` partition column is ignored by the probe's explicit
   * selects, and the pushed bval filter skips row groups exactly as in
   * the flat layout (each epoch file is bval-sorted). Compact with
   * [[graft.functions.Multimodal.compactPhashIndex]], which
   * consolidates every epoch into `__batch=-1`.
   */
  def phashIngestTo(media: DataFrame, indexPath: String, checkpoint: String,
                    availableNow: Boolean = true,
                    compactEvery: Int = 0): StreamingQuery = {
    val writer = media.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // ONLINE COMPACTION (round-15): a long-lived ingest accumulates
        // one file per touched dir per epoch; every `compactEvery`
        // epochs the accumulated epochs consolidate into `__batch=-1`
        // — inside the foreachBatch body (single-writer fence) and
        // BEFORE this epoch's write, so a crash-replayed epoch
        // overwrites its own fresh dir instead of duplicating rows the
        // compaction just consolidated. Probe results are bit-identical
        // across compactions (Round14OpsSpec). shouldCompactAt skips
        // the pass when this epoch already landed: a replayed boundary
        // epoch must not fold its own crashed rows into -1 before
        // re-landing them (round-15 advice).
        if (shouldCompactAt(batch.sparkSession, indexPath, batchId,
            compactEvery, nested = true))
          graft.functions.Multimodal.compactPhashIndex(
            batch.sparkSession, indexPath)
        phashIngestEpoch(batch, batchId, indexPath)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Seed a streaming phash index from a batch corpus — the reserved
    * `__batch=-1` epoch ([[ivfIngestBootstrap]]'s device). */
  def phashIngestBootstrap(spark: org.apache.spark.sql.SparkSession,
                           media: DataFrame, indexPath: String): Unit =
    phashIngestEpoch(media, -1L, indexPath)

  /** One epoch of [[phashIngestTo]] — factored out so the
    * replay-idempotence contract is directly testable: same
    * (batch, batchId) twice ≡ once. The epoch's partition set is
    * deterministic from the batch's bytes (hashes are pure functions of
    * content), so a replay's dynamic overwrite hits exactly the first
    * attempt's (pb, __batch) dirs. */
  private[graft] def phashIngestEpoch(batch: DataFrame, batchId: Long,
                                      indexPath: String): Unit = {
    import graft.functions.Multimodal
    val spark = batch.sparkSession
    Multimodal.phashBlocksOf(Multimodal.phashSignatures(spark, batch))
      .withColumn("__batch", lit(batchId))
      .repartition(math.max(1, spark.sparkContext.defaultParallelism),
        col("pb"))
      .sortWithinPartitions(col("pb"), col("bval"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pb", "__batch")
      .parquet(indexPath)
  }

  /** The video twin of [[phashIngestTo]]: per micro-batch, decode +
    * hash the epoch's videos and land their signature blocks under
    * `pb=…/__batch=N` with dynamic overwrite — same epoch-idempotence
    * contract, same probe compatibility ([[graft.functions.Multimodal
    * .videoPhashDedupAgainst]] projects the epoch column away), same
    * [[graft.functions.Multimodal.compactVideoPhashIndex]]
    * consolidation. */
  def videoPhashIngestTo(media: DataFrame, indexPath: String,
                         checkpoint: String, maxFrames: Int = 8,
                         availableNow: Boolean = true,
                         compactEvery: Int = 0): StreamingQuery = {
    val writer = media.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // periodic consolidation, see phashIngestTo (incl. replay skip)
        if (shouldCompactAt(batch.sparkSession, indexPath, batchId,
            compactEvery, nested = true))
          graft.functions.Multimodal.compactVideoPhashIndex(
            batch.sparkSession, indexPath)
        videoPhashIngestEpoch(batch, batchId, indexPath, maxFrames)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Seed a streaming video phash index from a batch corpus — the
    * reserved `__batch=-1` epoch. */
  def videoPhashIngestBootstrap(spark: org.apache.spark.sql.SparkSession,
                                media: DataFrame, indexPath: String,
                                maxFrames: Int = 8): Unit =
    videoPhashIngestEpoch(media, -1L, indexPath, maxFrames)

  private[graft] def videoPhashIngestEpoch(batch: DataFrame, batchId: Long,
                                           indexPath: String,
                                           maxFrames: Int): Unit = {
    import graft.functions.Multimodal
    val spark = batch.sparkSession
    Multimodal.videoSigBlocksOf(spark, batch, maxFrames)
      .withColumn("__batch", lit(batchId))
      .repartition(math.max(1, spark.sparkContext.defaultParallelism),
        col("pb"))
      .sortWithinPartitions(col("pb"), col("bval"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pb", "__batch")
      .parquet(indexPath)
  }

  /** The audio twin of [[phashIngestTo]]: per micro-batch, decode +
    * envelope-hash the epoch's clips and land their signature blocks
    * under `pb=…/__batch=N` with dynamic overwrite — same
    * epoch-idempotence contract, same probe compatibility
    * ([[graft.functions.Multimodal.audioPhashDedupAgainst]] projects
    * the epoch column away), same [[graft.functions.Multimodal
    * .compactAudioPhashIndex]] consolidation. */
  def audioPhashIngestTo(media: DataFrame, indexPath: String,
                         checkpoint: String,
                         availableNow: Boolean = true,
                         compactEvery: Int = 0): StreamingQuery = {
    val writer = media.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // periodic consolidation, see phashIngestTo (incl. replay skip)
        if (shouldCompactAt(batch.sparkSession, indexPath, batchId,
            compactEvery, nested = true))
          graft.functions.Multimodal.compactAudioPhashIndex(
            batch.sparkSession, indexPath)
        audioPhashIngestEpoch(batch, batchId, indexPath)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Seed a streaming audio phash index from a batch corpus — the
    * reserved `__batch=-1` epoch. */
  def audioPhashIngestBootstrap(spark: org.apache.spark.sql.SparkSession,
                                media: DataFrame,
                                indexPath: String): Unit =
    audioPhashIngestEpoch(media, -1L, indexPath)

  private[graft] def audioPhashIngestEpoch(batch: DataFrame, batchId: Long,
                                           indexPath: String): Unit = {
    import graft.functions.Multimodal
    val spark = batch.sparkSession
    Multimodal.audioSigBlocksOf(spark, batch)
      .withColumn("__batch", lit(batchId))
      .repartition(math.max(1, spark.sparkContext.defaultParallelism),
        col("pb"))
      .sortWithinPartitions(col("pb"), col("bval"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pb", "__batch")
      .parquet(indexPath)
  }

  /**
   * ONLINE maintenance of the persisted text-dedup index — the streaming
   * twin of [[graft.functions.Dedup.appendToDedupIndex]], with the epoch
   * idempotence the batch append cannot give (mode-append on a replayed
   * micro-batch would double the batch's rows — and duplicated index
   * rows are only *mostly* harmless to the probe: candidate pairs are
   * re-distincted, but a duplicated doc row doubles its shingle-set rows
   * and corrupts the Jaccard denominators). IVF got this twin in round 7
   * ([[ivfIngestTo]]); this closes the asymmetry for the dedup index,
   * ON THE PERSISTED INDEX LAYOUT (not the separate `nearDupDedupTo`
   * state tree): each micro-batch's shingle sets and band keys land
   * under `sets/__batch=N/` and `keys/__batch=N/` with OVERWRITE, so a
   * crash-replayed batch rewrites exactly its own epoch.
   *
   * The stream OWNS `indexPath` (epoch dirs cannot mix with
   * [[graft.functions.Dedup.buildDedupIndex]]'s flat files in one tree):
   * seed a pre-existing corpus with [[dedupIngestBootstrap]] (reserved
   * `__batch=-1`; micro-batch ids start at 0). Probes via
   * [[graft.functions.Dedup.dedupAgainstIndexed]] work unchanged — the
   * extra `__batch` partition column is projected away by the probe's
   * explicit selects. Compact with [[compactDedupIngestState]].
   */
  def dedupIngestTo(docs: DataFrame, indexPath: String, checkpoint: String,
                    idCol: String, textCol: String,
                    availableNow: Boolean = true): StreamingQuery = {
    val writer = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupIngestEpoch(batch, batchId, indexPath, idCol, textCol)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Per-JVM memo of the ingest index's layout (create-once by design,
    * same rationale as [[stateLayoutCache]]). */
  private val indexLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, Option[graft.functions.Dedup.BandedLayout]]()

  private def ingestIndexLayout(spark: org.apache.spark.sql.SparkSession,
                                indexPath: String)
      : Option[graft.functions.Dedup.BandedLayout] = {
    val resolved = indexLayoutCache.computeIfAbsent(indexPath,
      _ => graft.functions.Dedup.readDedupLayout(spark, indexPath))
    // same cache-vs-deleted-marker re-anchor as [[resolveStateLayout]]
    resolved.foreach { b =>
      val p = graft.functions.Dedup.layoutMarkerPath(indexPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p))
        graft.functions.Dedup.writeDedupLayout(spark, indexPath, b)
    }
    resolved
  }

  /** One epoch of [[dedupIngestTo]] — factored out so the
    * replay-idempotence contract is directly testable: same
    * (batch, batchId) twice ≡ once. Honors the index's layout marker:
    * epochs of a PARTITIONED index ([[dedupIngestBootstrapPartitioned]])
    * nest `ib=`/`bp=` dirs inside their `__batch=` partition, so
    * [[graft.functions.Dedup.dedupAgainstIndexed]] prunes probes of the
    * streamed index exactly as it does the batch-built one (partition
    * filters prune at any nesting level). */
  private[graft] def dedupIngestEpoch(batch: DataFrame, batchId: Long,
                                      indexPath: String, idCol: String,
                                      textCol: String): Unit = {
    import graft.functions.Dedup
    // shingle once, derive both tables from the materialized sets —
    // identical row shapes to the batch build/append, so a probe cannot
    // tell which path populated the index
    val sets = Dedup.shingleSets(batch, idCol, textCol)
      .localCheckpoint(false)
    ingestIndexLayout(batch.sparkSession, indexPath) match {
      case Some(layout) =>
        // same door-check as every banded writer: the bucket column
        // null-casts non-integral ids, silently landing every row in the
        // Hive default partition (the flat path below keeps supporting
        // them — no bucket arithmetic there)
        graft.functions.TopKAgg.requireIntegralId(batch, idCol,
          "partitioned dedup ingest")
        Dedup.bandedSets(sets, idCol, layout.setBuckets)
          .write.mode("overwrite").partitionBy("ib")
          .parquet(s"$indexPath/sets/__batch=$batchId")
        Dedup.bandedKeys(Dedup.bandKeysFromSets(sets, idCol),
          layout.bpChars)
          .write.mode("overwrite").partitionBy("bp")
          .parquet(s"$indexPath/keys/__batch=$batchId")
      case None =>
        sets.write.mode("overwrite")
          .parquet(s"$indexPath/sets/__batch=$batchId")
        Dedup.bandKeysFromSets(sets, idCol).write.mode("overwrite")
          .parquet(s"$indexPath/keys/__batch=$batchId")
    }
  }

  /** Seed [[dedupIngestTo]]'s index with a pre-existing corpus in the
    * reserved `__batch=-1` epoch (micro-batch ids start at 0). */
  def dedupIngestBootstrap(corpus: DataFrame, indexPath: String,
                           idCol: String, textCol: String): Unit =
    dedupIngestEpoch(corpus, -1L, indexPath, idCol, textCol)

  /** [[dedupIngestBootstrap]] in the PARTITION-PRUNABLE layout
    * ([[graft.functions.Dedup.buildDedupIndexPartitioned]]'s epoch-
    * partitioned streaming form): writes the layout marker, then the
    * seed epoch; every later streamed epoch and the compactor follow the
    * marker, and probes of the streamed index prune to the batch's own
    * band-prefix/id-bucket partitions instead of scanning the whole
    * accumulated corpus. */
  def dedupIngestBootstrapPartitioned(corpus: DataFrame, indexPath: String,
                                      idCol: String, textCol: String,
                                      setBuckets: Int = 64): Unit = {
    require(setBuckets > 0, s"setBuckets must be positive: $setBuckets")
    // stamping a banded marker onto a tree that already holds FLAT
    // epochs would brick every later read (partition discovery finds
    // leaf files at inconsistent depths) — the partitioned bootstrap
    // needs a fresh path, same rule the state side enforces
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(corpus.sparkSession.sparkContext.hadoopConfiguration)
    for (t <- Seq("sets", "keys"))
      require(!fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/$t")),
        s"dedupIngestBootstrapPartitioned: $indexPath already holds a " +
          "'" + t + "' table — a banded marker over existing flat epochs " +
          "would produce a mixed layout that breaks partition discovery; " +
          "bootstrap a fresh path (or compact + rebuild to migrate)")
    // band-prefix width from the seed corpus size (the streamed epochs
    // follow the marker, so the whole tree stays one width)
    graft.functions.Dedup.writeDedupLayout(corpus.sparkSession, indexPath,
      graft.functions.Dedup.BandedLayout(setBuckets,
        graft.functions.Dedup.autoBpChars(corpus.count())))
    dedupIngestEpoch(corpus, -1L, indexPath, idCol, textCol)
  }

  /** Compact [[dedupIngestTo]]'s epoch partitions — every epoch adds
    * files to both tables; consolidates each into the reserved
    * `__batch=-1` via the crash-safe [[consolidateEpochs]], preserving
    * the `ib=`/`bp=` dirs of a partitioned index. Run OFFLINE
    * (single-writer). Returns per-table row counts. */
  def compactDedupIngestState(spark: org.apache.spark.sql.SparkSession,
                              indexPath: String,
                              targetFiles: Int = 8): Map[String, Long] =
    graft.functions.Dedup.readDedupLayout(spark, indexPath) match {
      case Some(layout) => Map(
        "sets" -> consolidateEpochs(spark, s"$indexPath/sets") {
          (df, stageDir) =>
            df.repartition(
                graft.functions.Dedup.writeTasks(df, layout.setBuckets),
                col("ib"))
              .write.partitionBy("ib").parquet(stageDir)
        }.getOrElse(0L),
        "keys" -> consolidateEpochs(spark, s"$indexPath/keys") {
          (df, stageDir) =>
            df.repartition(
                graft.functions.Dedup.writeTasks(df, layout.bpDirs),
                col("bp"))
              .write.partitionBy("bp").parquet(stageDir)
        }.getOrElse(0L))
      case None =>
        Seq("sets", "keys").map(t =>
          t -> consolidateEpochs(spark, s"$indexPath/$t") { (df, stageDir) =>
            df.coalesce(targetFiles).write.parquet(stageDir)
          }.getOrElse(0L)).toMap
    }

  /**
   * Crash-safe consolidation of an epoch-partitioned table
   * (`root/__batch=N/...`) into the reserved `__batch=-1` epoch.
   *
   * The round-7 shape (overwrite `__batch=-1`, then delete old epochs)
   * had a non-convergent crash window: between the overwrite and the
   * deletes every compacted row existed twice, and a re-run baked the
   * duplicates into `__batch=-1` permanently (it re-read the duplicated
   * root) — and duplicated IVF list rows change probe results (a
   * duplicated neighbor eats two top-k slots). Now the consolidated
   * epoch is STAGED outside the tree and swapped in by rename, with a
   * manifest naming the epochs it supersedes, so every crash window
   * either rolls back (stage incomplete → discarded on the next run) or
   * rolls forward (stage complete → delete exactly the manifested
   * epochs, rename the stage in); no run ever reads a root holding both
   * the stage and the epochs it replaced. Run OFFLINE (single-writer).
   * Like [[graft.functions.ParquetCompact]], the roll-forward/roll-back
   * classification assumes ATOMIC directory rename (HDFS / local FS) —
   * on an object store, rename is copy+delete and a mid-rename crash
   * leaves a partial mix this protocol would misread; compact to a new
   * path + pointer flip there instead.
   * `epochPrefix` is the epoch directory naming (`__batch=` for the
   * ingest indexes, `batch=` for the dedup state). `writeStage` writes
   * the merged epochs (already stripped of the epoch column) to the
   * stage directory. Returns Some(row count after consolidation), or
   * None when there was nothing to consolidate.
   */
  private def consolidateEpochs(spark: org.apache.spark.sql.SparkSession,
                                rootPath: String,
                                epochPrefix: String = "__batch=")
                               (writeStage: (DataFrame, String) => Unit): Option[Long] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(rootPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(rootPath + ".__compact_tmp")
    val manifest = new Path(rootPath + ".__compact_manifest")
    val target = new Path(root, epochPrefix + "-1")
    val epochCol = epochPrefix.stripSuffix("=")

    def finishFromManifest(): Unit = {
      val named = {
        val in = fs.open(manifest)
        val bytes = try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
          out.toString("UTF-8")
        } finally in.close()
        bytes.split("\n").filter(_.nonEmpty)
      }
      named.foreach(n => fs.delete(new Path(root, n), true))
      require(fs.rename(tmp, target),
        s"consolidateEpochs: rename $tmp -> $target failed")
      fs.delete(manifest, false)
    }

    // crash recovery: a manifest with a COMPLETE stage (tmp/_SUCCESS)
    // rolls forward; with tmp already renamed in, only the manifest is
    // left to clean; an incomplete stage (or an orphan tmp) is discarded
    if (fs.exists(manifest)) {
      if (fs.exists(new Path(tmp, "_SUCCESS"))) finishFromManifest()
      else if (!fs.exists(tmp)) fs.delete(manifest, false)
      else { fs.delete(tmp, true); fs.delete(manifest, false) }
    } else if (fs.exists(tmp)) fs.delete(tmp, true)

    val epochs =
      if (!fs.exists(root)) Array.empty[Path]
      else fs.listStatus(root).map(_.getPath)
        .filter(_.getName.startsWith(epochPrefix))
    if (!epochs.exists(_.getName != epochPrefix + "-1")) None
    else {
      val out = fs.create(manifest, true)
      try out.write(epochs.map(_.getName).mkString("\n").getBytes("UTF-8"))
      finally out.close()
      // the source epochs are untouched until the stage commits (_SUCCESS)
      writeStage(
        spark.read.option("basePath", root.toString)
          .parquet(epochs.map(_.toString).toIndexedSeq: _*)
          .drop(epochCol),
        tmp.toString)
      finishFromManifest()
      Some(spark.read.parquet(root.toString).count())
    }
  }

  /**
   * Stream-stream interval join: enrich each event with the user's signup
   * event when it happened within `intervalMinutes` before the event —
   * the streaming cousin of [[graft.operators.AsOfJoin]] (which is the
   * unbounded-history batch form).
   *
   * Both sides must carry event-time watermarks when streaming.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   intervalMinutes: Int): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col("r.ts") <= col("l.ts") &&
        col("r.ts") >= col("l.ts") - expr(s"INTERVAL $intervalMinutes MINUTES"))
  }
}
