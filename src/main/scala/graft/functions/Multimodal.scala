package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing (SURVEY §2.6): image/audio/video payloads
 * travel as opaque `binary` columns with typed metadata; decode /
 * feature-extract / frame-sample are per-partition operations over the
 * binary payloads.
 *
 * The actual codecs are NOT available in this environment, so the decode
 * step is a clearly-marked deterministic stub ([[StubDecoder]]) — the
 * Spark-side plumbing (schema, batching, partition-parallel execution,
 * metadata extraction, frame sampling) is real and tested. Swapping
 * [[StubDecoder.decode]] for a JNI/FFI codec call changes nothing upstream.
 *
 * Scale notes: binary payloads make rows wide — the media scan should set
 * a smaller `spark.sql.files.maxPartitionBytes` so partitions stay
 * executor-memory-sized, and metadata-only queries must prune the binary
 * column (columnar parquet gives that for free as long as nothing selects
 * `content`).
 */
object Multimodal {

  /** A decoded media frame/feature row. */
  case class MediaFeature(docId: Long, kind: String, byteLen: Long,
                          width: Int, height: Int, fingerprint: String)

  /**
   * Deterministic stand-in for the real image/audio decoder: derives fake
   * dimensions and a fingerprint from the bytes. Replace with a real codec
   * (e.g. via FFI) in production — signature and batching stay identical.
   */
  object StubDecoder {
    def decode(docId: Long, kind: String, bytes: Array[Byte]): MediaFeature = {
      val len = bytes.length.toLong
      // fake "dimensions" derived deterministically from content length
      val w = (len % 640 + 64).toInt
      val h = (len % 480 + 48).toInt
      val md = java.security.MessageDigest.getInstance("MD5")
      val fp = md.digest(bytes).map("%02x".format(_)).mkString
      MediaFeature(docId, kind, len, w, h, fp)
    }
  }

  /** Media-table schema: opaque binary + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("byte_len", LongType, nullable = false)))

  /** Wrap a text table as a media table (content = utf-8 bytes) — the test
    * fixture for the binary plumbing. */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"), lit("text/plain").as("kind"),
      encode(col(textCol), "UTF-8").as("content"),
      length(encode(col(textCol), "UTF-8")).cast("long").as("byte_len"))

  /**
   * Partition-parallel decode: the real pattern for media feature
   * extraction (one decoder instance per partition, streamed rows, no
   * driver involvement).
   */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("doc_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (codec contexts are
        // expensive; amortize across the partition)
        it.map { case (id, kind, bytes) => StubDecoder.decode(id, kind, bytes) }
      }
  }

  /**
   * Exact media dedup: group by the md5 of the raw content bytes — the
   * media-side counterpart of [[Dedup.exact]] (dedup by pixels/samples
   * happens pre-decode: identical bytes are identical media regardless of
   * codec). One hash-partitioned groupBy on a uniform 128-bit key; the
   * binary column itself never shuffles (only its digest does).
   */
  def dedupByContent(media: DataFrame): DataFrame =
    media.groupBy(md5(col("content")).as("content_fp"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("copies"),
        max(col("byte_len")).as("byte_len"))

  /**
   * Resize / downsample stub: keep every k-th token of the payload — the
   * deterministic stand-in for image resize / audio downsampling (the
   * real kernel would run in [[decodeFeatures]]'s partition loop; the
   * Spark-side shape — payload in, smaller payload + metadata out — is
   * what this exercises).
   */
  def downsample(payload: Column, k: Int): Column =
    array_join(filter(split(payload, " "), (_, i) => i % k === 0), " ")

  /**
   * Frame sampling: split the payload into fixed-size frames and emit
   * (doc_id, frame_idx, frame_hash) — pure Column work, fully codegen'd.
   * Stands in for video frame extraction / audio windowing. `payload` is
   * the string view of the content (the fixture media is utf-8 text).
   */
  def sampleFrames(df: DataFrame, idCol: String, payload: Column,
                   frameBytes: Int = 64): DataFrame =
    df.withColumn("__n", floor(length(payload) / frameBytes))
      .filter(col("__n") > 0)
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(transform(sequence(lit(0), col("__n") - 1),
          i => md5(payload.substr(i * frameBytes + 1, lit(frameBytes)))))
          .as(Seq("frame_idx", "frame_hash")))
}
