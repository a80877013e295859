package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed Bloom filter for membership pruning at corpus scale.
 *
 * The 100 TB decontamination story ([[Dedup.decontaminateAgainst]],
 * reference internal/pipeline/stages.go filter semantics) keeps the
 * benchmark/eval universe broadcast-small and never shuffles the train
 * side. When the *blocklist itself* is too large for an exact broadcast
 * set but the train side is far larger still, the classic answer is a
 * Bloom filter: fixed-size, broadcastable, zero false negatives.
 *
 * Everything here is declarative Spark — no UDFs, no driver-side loops:
 *  - '''build''': one narrow pass over the key frame explodes each key
 *    into `k` bit positions (`xxhash64(key, seed)` — codegen'd), a single
 *    `bit_or` shuffle of `(word → mask)` pairs folds them into at most
 *    `m/64` sparse words, and a final single-row `map_from_entries`
 *    collects the SPARSE word map. The aggregate row is exactly the
 *    filter's size — the same thing any engine must materialize to
 *    broadcast a filter — and words never set are simply absent.
 *  - '''membership''': `k` statically-unrolled bit tests against the
 *    broadcast map (`element_at` + `shiftleft`), AND-reduced. All
 *    codegen-friendly scalar expressions; the corpus is never shuffled.
 *
 * Hashing contract: keys are `cast("string")` on BOTH the build and the
 * probe side before hashing, so the same logical value matches across
 * differently-typed columns. NULL keys hash like any value (xxhash64 of
 * the seed alone) — deterministic and consistent on both sides.
 *
 * Sizing: `sizeFor(n, fpp)` gives the standard optimal `(m, k)`
 * (`m = -n·ln p / ln²2`, `k = m/n·ln 2`). At `fpp = 1e-3` that is
 * ~14.4 bits/key — a 1e9-key blocklist is ~1.7 GiB, still a viable
 * broadcast; beyond that, shard the filter by key range and union the
 * flags (each shard stays fixed-size).
 */
object Bloom {

  /** Optimal (mBits, k) for `expectedKeys` at target false-positive rate.
    * mBits is rounded up to a multiple of 64 and floored at 64. */
  def sizeFor(expectedKeys: Long, fpp: Double): (Long, Int) = {
    require(expectedKeys > 0, s"expectedKeys=$expectedKeys must be > 0")
    require(fpp > 0 && fpp < 1, s"fpp=$fpp out of (0,1)")
    val ln2 = math.log(2)
    val m0 = math.ceil(-expectedKeys * math.log(fpp) / (ln2 * ln2)).toLong
    val m = math.max(64L, ((m0 + 63) / 64) * 64)
    // clamp to build()'s k <= 32 domain (reached only below fpp ~2^-32;
    // the extra hashes past 32 buy nothing measurable)
    val k = math.min(32,
      math.max(1, math.round(m.toDouble / expectedKeys * ln2).toInt))
    (m, k)
  }

  /** The `k` (word, mask) bit coordinates for one key expression. */
  private def coords(key: Column, i: Column, mBits: Long): (Column, Column) = {
    val pos = pmod(xxhash64(key.cast("string"), i), lit(mBits))
    val word = (pos / 64).cast("int")
    // shiftleft with a COLUMN shift count only exists at the SQL layer;
    // call_function routes to the same codegen'd ShiftLeft.
    val mask = call_function("shiftleft", lit(1L), (pos % 64).cast("int"))
    (word, mask)
  }

  /**
   * Build the filter over `keys.select(keyCol)`: returns a ONE-ROW frame
   * `(__bloom: map<int,long>)` holding the sparse word map, ready for
   * `crossJoin(broadcast(...))`. One shuffle, keyed by word index —
   * at most `m/64` groups regardless of key count.
   */
  def build(keys: DataFrame, keyCol: Column, mBits: Long, k: Int): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0, s"mBits=$mBits must be a multiple of 64")
    require(k >= 1 && k <= 32, s"k=$k out of [1,32]")
    val (word, mask) = coords(col("__key"), col("__i"), mBits)
    keys.select(keyCol.as("__key"))
      .select(col("__key"), explode(sequence(lit(0), lit(k - 1))).as("__i"))
      .select(word.as("__w"), mask.as("__m"))
      .groupBy(col("__w")).agg(expr("bit_or(__m)").as("__bits"))
      .agg(map_from_entries(collect_list(struct(col("__w"), col("__bits"))))
        .as("__bloom"))
  }

  /** Membership test against a `__bloom` map column built with the same
    * (mBits, k). Zero false negatives; false positives at the sized fpp. */
  def mightContain(bloomMap: Column, key: Column, mBits: Long, k: Int): Column =
    (0 until k).map { i =>
      val (word, mask) = coords(key, lit(i), mBits)
      coalesce(element_at(bloomMap, word), lit(0L)).bitwiseAND(mask) =!= 0
    }.reduce(_ && _)

  /**
   * Flag every row of `df` whose `keyCol` might be in `blockKeys`:
   * builds the filter distributed, broadcasts the one-row result, and
   * appends `flagCol` (boolean). The big side is a single scan —
   * no shuffle, no join on the corpus.
   */
  def flagMembers(df: DataFrame, keyCol: Column, blockKeys: DataFrame,
                  blockKeyCol: Column, mBits: Long, k: Int,
                  flagCol: String = "bloom_hit"): DataFrame =
    df.crossJoin(broadcast(build(blockKeys, blockKeyCol, mBits, k)))
      .withColumn(flagCol, mightContain(col("__bloom"), keyCol, mBits, k))
      .drop("__bloom")
}
