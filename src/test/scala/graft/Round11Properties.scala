package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Md5Prefix28, Multimodal, Sampling}
import graft.streaming.{KeySummaries, StreamOps}

/**
 * Property obligations for the round-11 machinery, against plain-Scala
 * reference models:
 *  - planGroups (the grouped-compaction plan arithmetic): order
 *    preservation, the cap contract (multi-epoch groups never exceed it,
 *    over-cap epochs isolate as singletons), strictly-decreasing gids,
 *    and the no-op-singleton drop being limited to negatives;
 *  - KeySummaries: a Bloom summary NEVER loses a member key (the bit
 *    whose absence would silently admit near-duplicates), with a bounded
 *    false-positive allowance;
 *  - VideoHeader: mp4Bytes → parse round-trips every constructed field,
 *    and every truncation strictly inside the header region is rejected
 *    rather than misread;
 *  - shardShuffle equals the naive "(h, key)-sorted rank within h mod S"
 *    model on random id sets.
 */
class Round11Properties extends AnyFunSuite {
  import SparkTestSession._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    PropertySamples.samples(g, n, 11042L)

  // ---- planGroups ---------------------------------------------------

  private val planGen: Gen[(Seq[Long], Map[Long, Long], Long)] = for {
    nNeg <- Gen.choose(0, 6)
    nPos <- Gen.choose(0, 10)
    negs <- Gen.pick(nNeg, (-20L to -1L))
    poss <- Gen.pick(nPos, (0L to 30L))
    cap <- Gen.choose(1L, 40L)
    counts <- Gen.sequence[List[(Long, Long)], (Long, Long)](
      (negs ++ poss).map(e => Gen.choose(0L, 25L).map(e -> _)).toList)
  } yield (negs.toSeq.sorted ++ poss.toSeq.sorted, counts.toMap, cap)

  test("property: planGroups preserves order, honors the cap, drops only no-op negatives") {
    samples(planGen, 60).foreach { case (candidates, counts, cap) =>
      val firstGid = math.min(0L, candidates.minOption.getOrElse(0L)) - 1L
      val plan = StreamOps.planGroups(candidates, counts, cap, firstGid)
      val flat = plan.flatMap(_._2)
      // order preserved: the flattened plan is candidates minus dropped
      val dropped = candidates.diff(flat)
      assert(flat == candidates.filterNot(dropped.contains),
        s"order not preserved: $plan from $candidates")
      // only negatives (no-op singletons) may be dropped
      assert(dropped.forall(_ < 0L), s"dropped a positive: $dropped")
      // every epoch appears at most once
      assert(flat.distinct == flat)
      plan.foreach { case (gid, es) =>
        val sum = es.map(counts.getOrElse(_, 0L)).sum
        // a multi-epoch group never exceeds the cap
        if (es.sizeIs > 1) assert(sum <= cap, s"group $gid over cap: $es")
        // an over-cap group can only be a singleton
        if (sum > cap) assert(es.sizeIs == 1)
        // a kept singleton is never a negative (those are no-ops)
        if (es.sizeIs == 1) assert(es.head >= 0L, s"kept no-op: $gid -> $es")
      }
      // gids strictly decreasing from firstGid
      val gids = plan.map(_._1)
      assert(gids.forall(_ <= firstGid))
      assert(gids == gids.sorted(Ordering[Long].reverse))
      // determinism
      assert(plan == StreamOps.planGroups(candidates, counts, cap, firstGid))
      // degenerate: everything fits one group → exactly one group holding
      // every candidate (unless that group would be a no-op negative
      // singleton)
      if (candidates.nonEmpty &&
        candidates.map(counts.getOrElse(_, 0L)).sum <= cap) {
        if (candidates.sizeIs == 1 && candidates.head < 0L)
          assert(plan.isEmpty)
        else assert(plan.map(_._2) == Seq(candidates))
      }
    }
  }

  // ---- KeySummaries: no false negatives -----------------------------

  private val keysGen: Gen[(List[String], List[String])] = for {
    n <- Gen.choose(1, 400)
    keys <- Gen.listOfN(n, Gen.choose(0L, Long.MaxValue).map(v => s"k$v"))
    m <- Gen.choose(1, 200)
    others <- Gen.listOfN(m, Gen.choose(0L, Long.MaxValue).map(v => s"o$v"))
  } yield (keys.distinct, others.distinct.filterNot(keys.contains))

  test("property: a key summary never loses a member; false positives stay rare") {
    var fp = 0L
    var probes = 0L
    samples(keysGen, 40).foreach { case (keys, others) =>
      val s = KeySummaries.build(keys)
      keys.foreach { k =>
        val (h1, h2) = KeySummaries.hashPair(k)
        assert(s.mightContain(h1, h2), s"false negative on $k")
      }
      // mightContainAny over any mix that includes one member is true
      val mixed = (others.take(5) :+ keys.head).map(KeySummaries.hashPair)
      assert(s.mightContainAny(mixed.toArray))
      others.foreach { k =>
        val (h1, h2) = KeySummaries.hashPair(k)
        if (s.mightContain(h1, h2)) fp += 1
        probes += 1
      }
    }
    // fpp is sized at 1e-6 — thousands of probes should see ~0 false
    // positives; allow 2 before calling the sizing broken
    assert(fp <= 2, s"$fp false positives in $probes probes")
  }

  // ---- VideoHeader: construct → parse round-trip --------------------

  private val mp4Gen: Gen[(String, Int, Long, Int, Int, Boolean, Array[Byte])] =
    for {
      brand <- Gen.oneOf("isom", "mp42", "avc1", "M4V ")
      ts <- Gen.choose(1, Int.MaxValue)
      v1 <- Gen.oneOf(true, false)
      dur <- if (v1) Gen.choose(0L, Long.MaxValue / 1000)
             else Gen.choose(0L, 0xFFFFFFFFL)
      w <- Gen.choose(1, 7680)
      h <- Gen.choose(1, 4320)
      pLen <- Gen.choose(0, 64)
      payload <- Gen.listOfN(pLen, Gen.choose(-128, 127).map(_.toByte))
    } yield (brand, ts, dur, w, h, v1, payload.toArray)

  test("property: mp4Bytes → VideoHeader.parse round-trips; header truncations reject") {
    samples(mp4Gen, 40).foreach { case (brand, ts, dur, w, h, v1, payload) =>
      val bytes = Multimodal.VideoHeader.mp4Bytes(brand, ts, dur, w, h, v1, payload)
      val info = Multimodal.VideoHeader.parse(bytes)
        .getOrElse(fail(s"constructed mp4 rejected (v1=$v1)"))
      assert(info.brand == brand)
      assert(info.timescale == ts.toLong)
      assert(info.duration == dur)
      assert(info.trackCount == 2) // one video + one audio track
      assert(info.width == w && info.height == h)
      assert(info.mdatLen == payload.length.toLong)
      val headerLen = (bytes.length - payload.length - 8).toLong
      assert(info.mdatOffset == headerLen + 8)
      // any cut strictly inside the pre-mdat header region must reject:
      // a half-read box that silently parsed would misreport the corpus
      val cuts = Seq(0, 7, 15, 23, 24, 30,
        headerLen.toInt / 2, headerLen.toInt - 1)
      cuts.filter(c => c >= 0 && c < headerLen).foreach { c =>
        assert(Multimodal.VideoHeader.parse(bytes.take(c)).isEmpty,
          s"truncation at $c of $headerLen parsed")
      }
      // a cut exactly at the end of moov is a VALID mdat-less container
      assert(Multimodal.VideoHeader.parse(bytes.take(headerLen.toInt))
        .exists(i => i.mdatOffset == -1L && i.brand == brand))
    }
  }

  // ---- batch sessionization vs naive gap-split model ----------------

  private val sessGen: Gen[(List[(Long, Long)], Int)] = for {
    n <- Gen.choose(1, 120)
    // tight timestamp range so duplicate timestamps and boundary-exact
    // gaps both occur
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 5L),
      Gen.choose(0L, 400L).map(_ * 60000000L))) // whole minutes in us
    gapMin <- Gen.choose(1, 45)
  } yield (rows, gapMin)

  test("property: byWindows == naive per-user gap split, ties and exact-gap edges included") {
    import spark.implicits._
    import graft.streaming.Sessionize
    samples(sessGen, 8).foreach { case (rows, gapMin) =>
      val gapUs = gapMin.toLong * 60 * 1000000
      val got = Sessionize.byWindows(
        rows.toDF("user_id", "ts_us").repartition(4), gapMin)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val want = rows.groupBy(_._1).flatMap { case (u, evs) =>
        val ts = evs.map(_._2).sorted
        // split where the gap to the previous event EXCEEDS gapUs
        // (an exactly-gap-sized gap stays in-session)
        val sessions = ts.tail.foldLeft(List(List(ts.head))) {
          case (acc @ (cur :: rest), t) =>
            if (t - cur.head > gapUs) List(t) :: acc
            else (t :: cur) :: rest
          case (Nil, t) => List(List(t))
        }.reverse
        sessions.zipWithIndex.map { case (s, i) =>
          (u, (i + 1).toLong) -> (s.length.toLong, s.min, s.max)
        }
      }
      assert(got == want, s"gap=${gapMin}m")
    }
  }

  // ---- TopKAgg merge path vs naive sort model -----------------------

  private val topkGen: Gen[(List[(Long, Int, Double)], Int)] = for {
    n <- Gen.choose(1, 120)
    // scores drawn from a SMALL set so duplicate scores are the norm —
    // tie handling across partial-buffer merges is the classic custom-
    // aggregate bug site one example spec cannot stress
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1, 6),
      Gen.choose(0, 9).map(_ * 0.1)))
    k <- Gen.choose(1, 10)
  } yield (rows.zipWithIndex.map { case ((g, s), i) =>
    (i.toLong, g, s) }, k)

  test("property: TopKAgg == naive (score DESC, id ASC) top-k across merge layouts") {
    import spark.implicits._
    import graft.functions.TopKAgg
    samples(topkGen, 8).foreach { case (rows, k) =>
      val got = rows.toDF("id", "g", "s").repartition(7)
        .groupBy(col("g")).agg(TopKAgg(col("s"), col("id"), k).as("top"))
        .collect().map(r => r.getInt(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(e =>
            (e.getDouble(0), e.getLong(1))).toList).toMap
      rows.groupBy(_._2).foreach { case (g, members) =>
        val want = members.map(m => (m._3, m._1))
          .sortBy { case (s, i) => (-s, i) }.take(k)
        assert(got(g) == want, s"g=$g k=$k")
      }
    }
  }

  // ---- AsOfJoin vs naive latest-at-or-before model -------------------

  private val asofGen: Gen[(List[(Int, Long)], List[(Int, Long, Long)])] =
    for {
      nl <- Gen.choose(1, 40)
      lefts <- Gen.listOfN(nl,
        Gen.zip(Gen.choose(1, 5), Gen.choose(0L, 50L)))
      nr <- Gen.choose(1, 40)
      rights <- Gen.listOfN(nr,
        Gen.zip(Gen.choose(1, 5), Gen.choose(0L, 50L), Gen.choose(1L, 999L)))
    } yield (lefts,
      // the operator (like the reference's dimension streams) assumes at
      // most one right row per (key, ts); duplicates would tie the sort
      rights.groupBy(r => (r._1, r._2)).values.map(_.head).toList)

  test("property: asOfJoin == latest right at-or-before, per key, inclusive at ties") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    samples(asofGen, 8).foreach { case (lefts, rights) =>
      val l = lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val ldf = l.toDF("lid", "k", "ts").repartition(4)
      val rdf = rights.toDF("k", "rts", "v").repartition(3)
      val rowsOut = AsOfJoin.lastValue(ldf, rdf, Seq("k"), "ts", "rts", "v")
        .select(col("lid"), col("asof_v"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
                                   else Some(r.getLong(1))))
      // every left row EXACTLY once — checked on the raw rows, before a
      // map could collapse a duplicating join's repeated lids
      assert(rowsOut.length == l.size,
        s"${rowsOut.length} rows out of ${l.size} left rows")
      val got = rowsOut.toMap
      l.foreach { case (lid, k, t) =>
        val want = rights.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        assert(got(lid) == want, s"lid=$lid k=$k ts=$t")
      }
    }
  }

  // ---- IntervalJoin.binned vs naive pair model ----------------------

  private val intervalGen: Gen[(List[(Int, Long)], List[(Int, Long)],
    Long, Long)] = for {
    nl <- Gen.choose(1, 30)
    lefts <- Gen.listOfN(nl, Gen.zip(Gen.choose(1, 4), Gen.choose(-50L, 50L)))
    nr <- Gen.choose(1, 30)
    rights <- Gen.listOfN(nr, Gen.zip(Gen.choose(1, 4), Gen.choose(-50L, 50L)))
    lo <- Gen.choose(-10L, 10L)
    span <- Gen.choose(0L, 15L)
  } yield (lefts, rights, lo, lo + span)

  test("property: binned interval join == naive pair model, incl. negative ts bins") {
    import spark.implicits._
    import graft.operators.IntervalJoin
    samples(intervalGen, 8).foreach { case (lefts, rights, lo, hi) =>
      val l = lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val r = rights.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val got = IntervalJoin.binned(
        l.toDF("lid", "k", "lts").repartition(4),
        r.toDF("rid", "k", "rts").repartition(3),
        Seq("k"), "lts", "rts", lo, hi)
        .select(col("lid"), col("rid"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      val want = (for {
        (lid, lk, lt) <- l
        (rid, rk, rt) <- r
        if lk == rk && rt >= lt + lo && rt <= lt + hi
      } yield (lid, rid)).sorted
      assert(got == want, s"window [$lo,$hi]")
    }
  }

  // ---- LSN parsing: the replication resume token's order ------------

  private val lsnGen: Gen[(Long, Long)] = for {
    hi <- Gen.choose(0L, 0xFFFFFFFFL)
    lo <- Gen.choose(0L, 0xFFFFFFFFL)
  } yield (hi, lo)

  test("property: lsnToLong == hi*2^32+lo across hex case and zero-padding; garbage is null") {
    import spark.implicits._
    import graft.sources.Wal2Json
    val cases = samples(lsnGen, 60)
    // rotate through upper/lower/zero-padded renderings of each token
    val df = cases.zipWithIndex.map { case ((hi, lo), i) =>
      val form = (i % 3) match {
        case 0 => f"$hi%X/$lo%X"
        case 1 => f"$hi%x/$lo%x"
        case _ => f"$hi%08X/$lo%08x"
      }
      (i, form)
    }.toDF("i", "lsn")
    val got = df.select(col("i"), Wal2Json.lsnToLong(col("lsn")).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    cases.zipWithIndex.foreach { case ((hi, lo), i) =>
      val want = BigInt(hi) * BigInt(4294967296L) + BigInt(lo)
      assert(BigInt(got(i).toBigInteger) == want, s"$hi/$lo (form ${i % 3})")
    }
    // malformed tokens must read NULL — Spark's conv maps garbage to 0,
    // which would order a corrupted token as the SMALLEST lsn and make
    // resume filters silently drop it; null is conservatively kept
    val bad = Seq("zz/10", "1g/0", "", "10", "123456789/0", "1/",
      "0x1/2").toDF("lsn")
    val badVals = bad.select(Wal2Json.lsnToLong(col("lsn")).as("v"))
      .collect().map(r => r.isNullAt(0))
    assert(badVals.forall(identity), "a malformed lsn parsed non-null")
  }

  // ---- Catalyst Bloom (decontamination gate): no false negatives ----

  private val bloomGen: Gen[(List[String], List[String], Double)] = for {
    n <- Gen.choose(1, 300)
    block <- Gen.listOfN(n, Gen.choose(0L, Long.MaxValue).map(v => s"b$v"))
    m <- Gen.choose(1, 150)
    probes <- Gen.listOfN(m, Gen.choose(0L, Long.MaxValue).map(v => s"p$v"))
    fpp <- Gen.oneOf(0.05, 0.01, 0.001)
  } yield (block.distinct, probes.distinct, fpp)

  test("property: the Catalyst Bloom never loses a blocklist member at any sizing") {
    import spark.implicits._
    samples(bloomGen, 8).foreach { case (block, others, fpp) =>
      val (mBits, k) = graft.functions.Bloom.sizeFor(block.length.toLong, fpp)
      val flagged = graft.functions.Bloom.flagMembers(
        (block ++ others).toDF("key"), col("key"),
        block.toDF("bk"), col("bk"), mBits, k)
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      // a false NEGATIVE admits contamination — zero tolerance
      block.foreach(b => assert(flagged(b), s"blocklisted $b not flagged"))
      // false positives only cost over-blocking, but the bound must
      // BIND per sizing: inputs are deterministic (fixed seeds), so a
      // 2x-expected + 3 cap cannot flake and trips a sizing regression
      // (e.g. a 10% rate against an fpp=0.001 sizing) that a global
      // loose cap would wave through
      val fp = others.count(flagged)
      assert(fp <= 2.0 * others.length * fpp + 3,
        s"$fp false positives in ${others.length} probes at fpp=$fpp")
    }
  }

  // ---- Checksum chains vs plain-Scala fold models -------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private val checksumGen: Gen[(List[Long], Int)] = for {
    n <- Gen.choose(1, 40)
    ids <- Gen.listOfN(n, Gen.choose(1L, 1000000000L))
    chunks <- Gen.choose(1, 50) // deliberately NOT dividing evenly
  } yield (ids.distinct, chunks)

  test("property: ordered/chunked/commutative checksums equal fold models at any chunk count") {
    import spark.implicits._
    import graft.operators.Checksum
    samples(checksumGen, 6).foreach { case (ids, chunks) =>
      // shuffle the input's physical order: every checksum must be a
      // pure function of the row SET, not the layout. SEEDED, so a
      // layout-sensitive failure replays with the exact same permutation
      val shuffled = new scala.util.Random(11042L + ids.length).shuffle(ids)
      val df = shuffled.map(i => (i, s"payload-$i"))
        .toDF("id", "v").repartition(5)
      val rows = ids.sorted.map(i => (i, md5hex(s"payload-$i")))
      // flat chain: fold in id order from ''
      val wantFlat = rows.foldLeft("") { case (st, (_, h)) => md5hex(st + h) }
      val gotFlat = Checksum.orderedChecksum(df, col("id"), md5(col("v")))
        .collect()(0).getString(0)
      assert(gotFlat == wantFlat)
      // chunked chain at an arbitrary chunk count: per-chunk fold in id
      // order, digest fold in chunk order
      val byChunk = rows.groupBy { case (i, _) =>
        java.lang.Math.floorMod(graft.functions.Md5Prefix28.eval(
          org.apache.spark.unsafe.types.UTF8String.fromString(i.toString)),
          chunks.toLong)
      }
      val wantChunked = byChunk.toSeq.sortBy(_._1).map { case (_, rs) =>
        rs.foldLeft("") { case (st, (_, h)) => md5hex(st + h) }
      }.foldLeft("")((st, d) => md5hex(st + d))
      val gotChunked = Checksum.orderedChecksumChunked(
        df, col("id"), md5(col("v")), numChunks = chunks)
        .collect()(0).getString(0)
      assert(gotChunked == wantChunked, s"chunks=$chunks")
      // commutative triple
      val wantSum = rows.map { case (_, h) =>
        java.lang.Long.parseLong(h.substring(0, 5), 16) }.sum
      val wantXor = rows.map { case (_, h) =>
        java.lang.Long.parseLong(h.substring(0, 15), 16) }
        .foldLeft(0L)(_ ^ _)
      val c = Checksum.commutativeChecksum(df, md5(col("v"))).collect()(0)
      assert((c.getLong(0), c.getLong(1), c.getLong(2)) ==
        ((wantSum, wantXor, ids.length.toLong)))
      // difference sensitivity: one flipped row flips both chains
      val df2 = df.withColumn("v",
        when(col("id") === ids.head, lit("payload-FLIPPED"))
          .otherwise(col("v")))
      assert(Checksum.orderedChecksum(df2, col("id"), md5(col("v")))
        .collect()(0).getString(0) != wantFlat)
      assert(Checksum.orderedChecksumChunked(df2, col("id"), md5(col("v")),
        numChunks = chunks).collect()(0).getString(0) != wantChunked)
    }
  }

  // ---- AudioHeader: construct → parse round-trip --------------------

  private val wavGen: Gen[(Int, Int, Int, Array[Byte])] = for {
    ch <- Gen.choose(1, 8)
    rate <- Gen.choose(8000, 192000)
    bits <- Gen.oneOf(8, 16, 24, 32)
    pLen <- Gen.choose(1, 64)
    payload <- Gen.listOfN(pLen, Gen.choose(-128, 127).map(_.toByte))
  } yield (ch, rate, bits, payload.toArray)

  test("property: wavBytes/mp3Bytes → AudioHeader.parse round-trips; prefixes reject") {
    samples(wavGen, 40).foreach { case (ch, rate, bits, payload) =>
      val bytes = Multimodal.AudioHeader.wavBytes(ch, rate, bits, payload)
      val info = Multimodal.AudioHeader.parse(bytes)
        .getOrElse(fail(s"constructed wav rejected (ch=$ch rate=$rate)"))
      assert(info.format == "audio/wav")
      assert(info.channels == ch && info.sampleRate == rate &&
        info.bitsPerSample == bits)
      // same two integer divisions as the parser's byteRate→kbps chain
      assert(info.bitrateKbps == rate * ch * bits / 8 * 8 / 1000)
      assert(info.headerLen == 64 && info.dataLen == payload.length.toLong)
      // ANY strict prefix must reject (the declared data size overruns a
      // cut payload; header cuts leave a half-read chunk) — a prefix
      // that silently parsed would misreport dataLen
      Seq(0, 11, 43, 44, 55, 56, 63, 64, bytes.length - 1).foreach { c =>
        assert(Multimodal.AudioHeader.parse(bytes.take(c)).isEmpty,
          s"wav prefix $c of ${bytes.length} parsed")
      }
      // mp3: fixed-shape builder round-trips its documented constants
      val mp3 = Multimodal.AudioHeader.mp3Bytes(payload)
      val mi = Multimodal.AudioHeader.parse(mp3)
        .getOrElse(fail("constructed mp3 rejected"))
      assert(mi == Multimodal.AudioHeader.AudioInfo("audio/mpeg", 2,
        44100, 0, 128, 34, payload.length.toLong))
      // a non-synchsafe ID3 size byte (high bit set) must reject
      val bad = mp3.clone(); bad(6) = 0x80.toByte
      assert(Multimodal.AudioHeader.parse(bad).isEmpty)
    }
  }

  // ---- shardShuffle vs naive model ----------------------------------

  private val shardGen: Gen[(List[Long], Int, String)] = for {
    n <- Gen.choose(1, 80)
    ids <- Gen.listOfN(n, Gen.choose(1L, 1000000L))
    shards <- Gen.choose(1, 12)
    seed <- Gen.identifier.map(_.take(8))
  } yield (ids.distinct, shards, seed)

  test("shardShuffle rejects null keys and clobbering column names loudly") {
    import spark.implicits._
    // a null key raises at execution instead of silently hashing to one
    // slot (and diverging from the SQL oracle's NULL-propagating concat)
    val withNull = Seq(Some(1L), None, Some(3L)).toDF("doc_id")
    val ex = intercept[Exception] {
      Sampling.shardShuffle(withNull, col("doc_id"), 4, "s").collect()
    }
    // pin the raise_error message through the wrap chain, so any OTHER
    // eager failure on this input cannot satisfy the test
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage))
      .mkString(" | ")
    assert(msgs.contains("null shard key"), msgs)
    // an input already carrying shard/pos fails fast, not with a
    // downstream ambiguous-reference error — and the guard is
    // case-insensitive, because withColumn resolves case-insensitively
    val clash = Seq((1L, 0)).toDF("doc_id", "shard")
    val ex2 = intercept[IllegalArgumentException] {
      Sampling.shardShuffle(clash, col("doc_id"), 4, "s")
    }
    assert(ex2.getMessage.contains("shard"))
    val clashCase = Seq((1L, 0)).toDF("doc_id", "POS")
    val ex3 = intercept[IllegalArgumentException] {
      Sampling.shardShuffle(clashCase, col("doc_id"), 4, "s")
    }
    assert(ex3.getMessage.contains("POS"))
  }

  test("property: shardShuffle == (h, key)-sorted rank within h mod shards") {
    import spark.implicits._
    samples(shardGen, 8).foreach { case (ids, shards, seed) =>
      val df = ids.map(i => (i, s"p$i")).toDF("doc_id", "payload")
      val got = Sampling.shardShuffle(df, col("doc_id"), shards, seed)
        .select("shard", "pos", "doc_id").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      def h(i: Long): Long = Md5Prefix28.eval(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$seed:$i"))
      val want = ids.groupBy(i => (h(i) % shards).toInt).flatMap {
        case (shard, members) =>
          members.sortBy(i => (h(i), i)).zipWithIndex.map {
            case (i, pos) => (shard, pos.toLong, i)
          }
      }.toSet
      assert(got == want, s"shards=$shards seed=$seed")
    }
  }
}
