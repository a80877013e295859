package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (SURVEY §2.6): brute-force
 * cosine top-k as the exact baseline, and a deterministic LSH-bucketed
 * variant as the scale path.
 *
 * Scale design: the brute-force path broadcasts the (tiny) probe vector and
 * scans the corpus once — O(n·d) map work, no shuffle, the right baseline
 * even at 100 TB when k is small (top-k via `orderBy…limit` runs as a
 * per-partition partial top-k + single reduce). The LSH path buckets
 * vectors by a short signature so a probe only scans its bucket —
 * trading recall for a ~2^bits scan reduction; bucket ids are also the
 * natural partitioning key for an IVF-style layout on disk.
 *
 * All arithmetic is promoted to double BEFORE multiplication and folded
 * sequentially (aggregate HOF) so results are deterministic and
 * reproducible across engines.
 */
object Similarity {

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two float vectors, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two vector columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Brute-force cosine top-k: nearest `k` vectors to the probe row
   * (`probeId`), probe broadcast, self excluded.
   */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
                 probeId: Long, k: Int): DataFrame = {
    val probe = broadcast(
      df.filter(col(idCol) === probeId).select(col(vecCol).as("__probe")))
    df.crossJoin(probe)
      .filter(col(idCol) =!= probeId)
      .select(col(idCol), cosine(col(vecCol), col("__probe")).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * Deterministic rank-LSH bucket id: `bits` sign comparisons between fixed
   * coordinate pairs (dim i vs dim i+offset). Cheap, data-independent, and
   * reproducible — the moral equivalent of random-hyperplane signs without
   * needing shared RNG state across engines/executors.
   */
  def rankLshBucket(vec: Column, bits: Int = 4, offset: Int = 32): Column =
    (0 until bits).map { i =>
      when(element_at(vec, i + 1) > element_at(vec, i + 1 + offset),
        lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _).cast("int")

  /**
   * LSH-bucketed ANN: probe scans only its own bucket, then exact cosine
   * rank within it. Returns top-k of the probe's bucket.
   */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              probeId: Long, k: Int): DataFrame = {
    val bucketed = df.withColumn("__bucket", rankLshBucket(col(vecCol)))
    val probe = broadcast(bucketed.filter(col(idCol) === probeId)
      .select(col(vecCol).as("__probe"), col("__bucket").as("__pbucket")))
    bucketed.join(probe, col("__bucket") === col("__pbucket"))
      .filter(col(idCol) =!= probeId)
      .select(col(idCol), cosine(col(vecCol), col("__probe")).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /**
   * Embedding-cosine near-duplicate pairs: candidate pairs share a rank-LSH
   * bucket (so the join emits bucket-local pairs, not n² pairs), then exact
   * cosine filters at `threshold`. The LSH prefilter trades recall for a
   * ~2^bits reduction of the pair space — the standard near-dup shape at
   * corpus scale.
   */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    // norms computed once per vector (not once per pair) — the join then
    // evaluates a single dot product per candidate pair
    val bucketed = df.select(col(idCol), col(vecCol),
      rankLshBucket(col(vecCol)).as("__bucket"),
      norm(col(vecCol)).as("__norm"))
    val a = bucketed.select(col(idCol).as("vec_a"),
      col(vecCol).as("__va"), col("__bucket"), col("__norm").as("__na"))
    val b = bucketed.select(col(idCol).as("vec_b"),
      col(vecCol).as("__vb"), col("__bucket"), col("__norm").as("__nb"))
    a.join(b, "__bucket")
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos",
        dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /**
   * Per-label centroid components (IVF-style coarse quantizer statistics).
   * The per-dimension sum is folded over a sorted array so the double
   * accumulation order is deterministic (same result on any cluster layout —
   * and in any other engine).
   */
  def centroidComponents(df: DataFrame, labelCol: String, idCol: String,
                         vecCol: String, dims: Int): DataFrame =
    df.select(col(labelCol), col(idCol),
      posexplode(col(vecCol)).as(Seq("pos", "v")))
      .filter(col("pos") < dims)
      .groupBy(col(labelCol), col("pos"))
      .agg(sort_array(collect_list(struct(col(idCol).as("k"),
        col("v").cast("double").as("v")))).as("vs"),
        count(lit(1)).as("n"))
      .select(col(labelCol), col("pos"),
        (aggregate(col("vs"), lit(0.0), (acc, x) => acc + x.getField("v")) /
          col("n")).as("dim_avg"))
}
