package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.{Bpe, BpeTokenize, Md5Prefix28, Md5SignBits, Sampling, Similarity, Subword, SubwordTokenize, TextClean, TextFns, TopKAgg, Unigram, UnigramTokenize}

/**
 * SparkSessionExtensions entry point: registers the engine's native
 * expressions for SQL use. Activate with
 * `spark.sql.extensions=graft.GraftExtensions` (or call
 * [[GraftExtensions.register]] on a live session).
 *
 * SQL surface:
 *  - `md5_prefix28(s)` — 28-bit md5 prefix (shingle hashing)
 *  - `md5_sign_bits(s, bits)` — SimHash bit tests as a long word
 *  - `topk_agg(score, id, k)` — bounded top-k aggregate,
 *    (score DESC, id ASC)
 *  - `cosine_sim(a, b)` / `dot_product(a, b)` — deterministic
 *    sequential-fold vector math (double-promoted before multiply)
 *  - `shingles(text)` — the engine's distinct 3-gram set (dedup domain)
 *  - `lang_id(text)` — stopword-profile language id
 *  - `norm_text(s)` / `redact_pii(s)` — text canonicalization / PII
 *  - `split_label(key, trainPct, valPct)` — deterministic
 *    train/val/test assignment by key hash
 *  - `quality_score(text)` — the engine's document quality score
 *  - `chunk_text(text, win, overlap)` — fixed-window training chunks
 *  - `bucket_us(tsUs, everyUs)` — floor time-bucketing (resample domain)
 *  - `subword_tokenize(loweredText)` — WordPiece greedy longest-match
 *    over the engine's fixture vocab (the packing/budget token unit)
 *  - `bpe_tokenize(loweredText)` — merge-rank BPE over the fixture
 *    merge table (the GPT-family budget unit)
 *  - `unigram_tokenize(loweredText)` — unigram-LM Viterbi over the
 *    fixture cost table (the SentencePiece-family budget unit)
 *
 * The composed functions expand to the SAME Column trees the library
 * API builds (via ColumnBridge), so SQL users get identical semantics,
 * codegen, and engine-parity guarantees — not a parallel implementation.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("md5_prefix28", classOf[Md5Prefix28].getName, { children =>
      require(children.length == 1, "md5_prefix28 expects one argument")
      Md5Prefix28(children.head)
    }),
    ("md5_sign_bits", classOf[Md5SignBits].getName, { children =>
      require(children.length == 2, "md5_sign_bits expects (str, bits)")
      Md5SignBits(children.head, intLit(children(1), "bits"))
    }),
    ("topk_agg", classOf[TopKAgg].getName, { children =>
      require(children.length == 3, "topk_agg expects (score, id, k)")
      TopKAgg(children(0), children(1), intLit(children(2), "k"))
        .toAggregateExpression()
    }),
    ("cosine_sim", Similarity.getClass.getName, { children =>
      require(children.length == 2, "cosine_sim expects (a, b)")
      ColumnBridge.eagerExpression(Similarity.cosine(
        ColumnBridge.column(children(0)), ColumnBridge.column(children(1))))
    }),
    ("dot_product", Similarity.getClass.getName, { children =>
      require(children.length == 2, "dot_product expects (a, b)")
      ColumnBridge.eagerExpression(Similarity.dot(
        ColumnBridge.column(children(0)), ColumnBridge.column(children(1))))
    }),
    ("shingles", TextFns.getClass.getName, { children =>
      require(children.length == 1, "shingles expects one argument")
      ColumnBridge.eagerExpression(TextFns.shingles(ColumnBridge.column(children.head)))
    }),
    ("lang_id", TextFns.getClass.getName, { children =>
      require(children.length == 1, "lang_id expects one argument")
      ColumnBridge.eagerExpression(TextFns.langId(ColumnBridge.column(children.head)))
    }),
    ("norm_text", TextClean.getClass.getName, { children =>
      require(children.length == 1, "norm_text expects one argument")
      ColumnBridge.eagerExpression(TextClean.normalize(ColumnBridge.column(children.head)))
    }),
    ("redact_pii", TextClean.getClass.getName, { children =>
      require(children.length == 1, "redact_pii expects one argument")
      ColumnBridge.eagerExpression(TextClean.redactPii(ColumnBridge.column(children.head)))
    }),
    ("split_label", Sampling.getClass.getName, { children =>
      require(children.length == 3, "split_label expects (key, trainPct, valPct)")
      ColumnBridge.eagerExpression(Sampling.splitLabel(
        ColumnBridge.column(children(0)),
        intLit(children(1), "trainPct"), intLit(children(2), "valPct")))
    }),
    ("quality_score", TextFns.getClass.getName, { children =>
      require(children.length == 1, "quality_score expects one argument")
      ColumnBridge.eagerExpression(TextFns.qualityScore(ColumnBridge.column(children.head)))
    }),
    ("chunk_text", TextFns.getClass.getName, { children =>
      require(children.length == 3, "chunk_text expects (text, win, overlap)")
      ColumnBridge.eagerExpression(TextFns.chunks(ColumnBridge.column(children.head),
        intLit(children(1), "win"), intLit(children(2), "overlap")))
    }),
    ("bucket_us", graft.operators.TimeSeries.getClass.getName, { children =>
      require(children.length == 2, "bucket_us expects (tsUs, everyUs)")
      ColumnBridge.eagerExpression(graft.operators.TimeSeries.bucketUs(
        ColumnBridge.column(children.head), longLit(children(1), "everyUs")))
    }),
    ("subword_tokenize", classOf[SubwordTokenize].getName, { children =>
      require(children.length == 1, "subword_tokenize expects one argument")
      SubwordTokenize(children.head, Subword.defaultPieces)
    }),
    ("bpe_tokenize", classOf[BpeTokenize].getName, { children =>
      require(children.length == 1, "bpe_tokenize expects one argument")
      BpeTokenize(children.head, Bpe.defaultMerges)
    }),
    ("unigram_tokenize", classOf[UnigramTokenize].getName, { children =>
      require(children.length == 1, "unigram_tokenize expects one argument")
      UnigramTokenize(children.head, Unigram.defaultPieces)
    }))

  private[graft] val descriptors = builders.map { case (name, clazz, builder) =>
    (FunctionIdentifier(name), new ExpressionInfo(clazz, name), builder)
  }

  /** Register on an already-running session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
