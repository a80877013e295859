package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines (SURVEY
 * §2.6 extension set): tokenization, shingling, language id, quality
 * scoring, fingerprinting.
 *
 * Everything here is a pure Column expression (built-in functions + HOFs) —
 * whole-stage-codegen'd, no UDFs, no shuffles. At 100 TB these run as
 * embarrassingly-parallel map work over the document scan.
 */
object TextFns {

  /** Whitespace tokens (single-space tokenizer for the corpus's normalized
    * text; see [[regexTokens]] for the BPE-ish variant). */
  def words(text: Column): Column = split(text, " ")

  /** BPE-flavored tokens: letter runs, digit runs, single other glyphs. */
  val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit(TokenPattern), lit(0))

  /**
   * BM25-style ranked retrieval over the corpus, with a RATIONAL idf —
   * `(N - df + 0.5) / (df + 0.5)` instead of the logarithmic form: `ln`
   * is not bit-reproducible across engines, while IEEE +,·,/ are, so
   * scores (not just ranks) are engine-identical. Each term's idf is
   * monotone in df either way, but the rational form weights rare terms
   * more aggressively than log-idf, so MULTI-term rankings can differ
   * from classic BM25 when documents match different term subsets — this
   * is a deliberate variant, not a drop-in BM25 replacement. Query terms
   * match document tokens EXACTLY (no case folding on either side).
   *
   * Scale shape: one shuffle for per-(doc, term) tf over query terms only
   * (the filter prunes before the shuffle), tiny df/corpus aggregates
   * broadcast back, and the per-doc score folds its few term scores in
   * lexicographic order — deterministic double summation. Top-N runs as
   * per-partition partial top-N + single reduce.
   */
  def bm25Rank(df: DataFrame, idCol: String, textCol: String,
               query: Seq[String], k1: Double = 1.2, b: Double = 0.75,
               topN: Int = 10): DataFrame = {
    val docLens = df.select(col(idCol),
      size(words(col(textCol))).cast("long").as("__len"))
    // exact integer corpus stats (order-free): avgdl derived at use site
    val corpus = docLens.agg(count(lit(1)).as("__n"), sum(col("__len")).as("__sl"))
    val tf = df.select(col(idCol),
      explode(words(col(textCol))).as("term"))
      .filter(col("term").isin(query: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__tf"))
      .localCheckpoint(false) // feeds dfreq AND the score join — one scan
    // tf already has exactly one row per (doc, term) — derive df from it
    // instead of re-scanning the corpus (no cross-branch CSE in Spark)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(docLens, idCol)
      .crossJoin(broadcast(corpus))
      .withColumn("__s",
        ((col("__n") - col("__df")).cast("double") + lit(0.5)) /
          (col("__df").cast("double") + lit(0.5)) *
          (col("__tf").cast("double") * lit(k1 + 1)) /
          (col("__tf").cast("double") + lit(k1) *
            (lit(1 - b) + lit(b) *
              (col("__len").cast("double") /
                (col("__sl").cast("double") / col("__n"))))))
    scored.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("term"), col("__s")))).as("ss"))
      .select(col(idCol),
        aggregate(col("ss"), lit(0.0), (acc, e) => acc + e.getField("__s"))
          .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topN)
  }

  /**
   * Per-document top-k terms by tf-idf — keyword extraction for corpus
   * tagging/exploration. RATIONAL idf, same reasoning as [[bm25Rank]]:
   * `tfidf = tf · (N+1)/(df+1)` is IEEE division/multiplication of exact
   * integers, bit-identical across engines, where `ln`-idf is not.
   * Ties break on term asc, so the top-k set is fully deterministic.
   *
   * Scale shape: one (doc, term) tf shuffle (the inherent cost of exact
   * tf), document frequency aggregated FROM tf (no second corpus scan),
   * then tf re-keys by term for the df join and by doc for the top-k
   * window. The join strategy is left to Catalyst/AQE: df-counts are
   * vocabulary-sized — broadcast when small, shuffle-join when the vocab
   * outgrows a broadcast (Heap's law keeps it sublinear in the corpus,
   * but 100 TB vocabularies don't fit an executor). Nothing is ever
   * collected to the driver.
   */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val tf = df.select(col(idCol), explode(words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(false) // feeds dfreq AND the score join — one scan
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val corpus = df.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term").crossJoin(broadcast(corpus))
      .withColumn("tfidf", col("tf").cast("double") *
        ((col("__n").cast("double") + lit(1.0)) /
          (col("__df").cast("double") + lit(1.0))))
      .withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("tfidf"))
  }

  /**
   * Unigram language-model fluency score — the CCNet-style quality signal
   * (Wenzek et al. 2020, public): documents made of corpus-frequent
   * tokens score high, documents of rare/garbage tokens score low. The
   * model is the corpus's own unigram distribution `p(w) = cf(w)/N`.
   *
   * Standard perplexity is `exp(-mean ln p)` — a geometric mean, and
   * `ln`/`exp` are not bit-reproducible across engines (the same reason
   * [[bm25Rank]] uses a rational idf). This emits the HARMONIC-mean
   * token probability instead: `hm_prob = n_doc / Σ_i 1/p(w_i)` — pure
   * IEEE +,·,/ of exact integers, engine-identical, and monotone in the
   * same direction (the harmonic mean lower-bounds the geometric mean,
   * equality iff all token probabilities are equal, so both orders
   * documents from garbage to fluent; 1/hm_prob is a perplexity-like
   * "mean inverse probability"). The per-doc sum folds its terms in
   * lexicographic order — deterministic double summation.
   *
   * Scale shape: ONE (doc, term) tf shuffle (the inherent cost of exact
   * tf, shared with [[tfIdfTopTerms]]); corpus frequencies aggregated
   * FROM tf (no second corpus scan); the N total is a one-row broadcast;
   * the cf join strategy is left to Catalyst/AQE (vocabulary-sized).
   *
   * Returns (idCol, n_tokens, n_terms, hm_prob), one row per document.
   */
  def unigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.select(col(idCol), explode(words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__tf"))
      .localCheckpoint(false) // feeds cf AND the score fold — one scan
    val cf = tf.groupBy(col("term")).agg(sum(col("__tf")).as("__cf"))
    val corpus = cf.agg(sum(col("__cf")).as("__N"))
    tf.join(cf, "term").crossJoin(broadcast(corpus))
      // 1/p per token, summed per (doc, term): tf · (N / cf)
      .withColumn("__inv", col("__tf").cast("double") *
        (col("__N").cast("double") / col("__cf").cast("double")))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        sort_array(collect_list(struct(col("term"), col("__inv")))).as("__ss"))
      .select(col(idCol), col("n_tokens"), col("n_terms"),
        (col("n_tokens").cast("double") /
          aggregate(col("__ss"), lit(0.0),
            (acc, e) => acc + e.getField("__inv"))).as("hm_prob"))
  }

  /** Unigram model for [[unigramLmScoreAgainst]]: (term, cf) corpus
    * frequencies — build once (write to a table at scale), score many. */
  def unigramModel(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(words(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cf"))

  /**
   * Cross-corpus unigram LM scoring — the production form of
   * [[unigramLmScore]]: the model is TRAINED ONCE on a reference corpus
   * ([[unigramModel]] — e.g. a trusted high-quality subset) and new
   * documents are scored against it, the CCNet device of ranking crawl
   * text by an LM trained on curated data. Out-of-vocabulary tokens get
   * Laplace mass: `p(w) = (cf(w)+1) / (N+V+1)` (unseen → `1/(N+V+1)`) —
   * still pure rational arithmetic, engine-identical.
   *
   * Scale shape: the model is vocabulary-sized (Catalyst/AQE picks
   * broadcast vs shuffle for the left join); its (N, V) totals are a
   * one-row broadcast; scored docs cost one (doc, term) tf shuffle.
   * In streaming, build the model pre-stream and score each micro-batch
   * as pure map+join work (the [[graft.streaming.StreamOps]] Bloom
   * pattern).
   *
   * Returns (idCol, n_tokens, n_oov, hm_prob).
   */
  def unigramLmScoreAgainst(model: DataFrame, docs: DataFrame,
                            idCol: String, textCol: String): DataFrame = {
    val stats = model.agg(sum(col("cf")).as("__N"),
      count(lit(1)).as("__V"))
    docs.select(col(idCol), explode(words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__tf"))
      .join(model, Seq("term"), "left")
      .crossJoin(broadcast(stats))
      // smoothed 1/p per (doc, term): tf · ((N+V+1) / (cf+1))
      .withColumn("__inv", col("__tf").cast("double") *
        ((col("__N") + col("__V") + lit(1L)).cast("double") /
          (coalesce(col("cf"), lit(0L)) + lit(1L)).cast("double")))
      .withColumn("__oov", when(col("cf").isNull, col("__tf")).otherwise(lit(0L)))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_tokens"),
        sum(col("__oov")).as("n_oov"),
        sort_array(collect_list(struct(col("term"), col("__inv")))).as("__ss"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        (col("n_tokens").cast("double") /
          aggregate(col("__ss"), lit(0.0),
            (acc, e) => acc + e.getField("__inv"))).as("hm_prob"))
  }

  /**
   * Distinct word n-gram shingles (default 3). Guarded so documents shorter
   * than n words yield an empty set rather than a bad sequence.
   *
   * Built by zipping the word array with its own shifted slices — O(words)
   * per row. (The naive `transform(sequence(...), i -> element_at(w, i))`
   * form re-inlines the split into every element lookup — HOF lambdas
   * don't CSE outer expressions — making it O(words²) per row; measured
   * 7s vs 0.5s on 5k docs.)
   */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = words(text)
    val joined = (1 until n).foldLeft(w) { (acc, o) =>
      zip_with(acc, slice(w, lit(o + 1), size(w) - o),
        (x, y) => concat(x, lit(" "), y))
    }
    when(size(w) >= n, array_distinct(filter(joined, x => x.isNotNull)))
      .otherwise(array().cast("array<string>"))
  }

  /**
   * Fixed-size training windows: split a document into chunks of `win`
   * tokens, consecutive chunks sharing `overlap` tokens (stride =
   * win-overlap) — the chunking pass that precedes sequence packing in a
   * training-data pipeline. Returns `array<struct<chunk_idx,n_tokens,
   * chunk>>`; posexplode to rows.
   *
   * Pure Column work, no shuffle. Cost note: the word array re-inlines
   * into each chunk's slice (HOF lambdas don't CSE outer expressions), so
   * a row costs O(n_chunks · words) — fine for chunk counts in the tens;
   * for huge documents split upstream first.
   */
  def chunks(text: Column, win: Int, overlap: Int = 0): Column = {
    require(win > 0 && overlap >= 0 && overlap < win,
      s"need 0 <= overlap < win, got win=$win overlap=$overlap")
    val stride = win - overlap
    val w = words(text)
    // windows start at 0, stride, 2·stride, … while the start is inside
    // the document; a doc shorter than one window still gets chunk 0
    val nChunks = greatest(
      ceil((size(w) - overlap).cast("double") / stride).cast("int"), lit(1))
    transform(sequence(lit(0), nChunks - 1), i => {
      val s = slice(w, i * stride + 1, lit(win))
      struct(i.cast("int").as("chunk_idx"), size(s).as("n_tokens"),
        array_join(s, " ").as("chunk"))
    })
  }

  /** Fraction of words that appear in `list` (a stopword table). */
  def stopwordRatio(text: Column, list: Seq[String]): Column = {
    val w = words(text)
    size(filter(w, x => x.isin(list: _*))).cast("double") / size(w)
  }

  // Small per-language stopword profiles for the n-gram/stopword heuristic
  // language id. Deliberately tiny — the operator's shape (profile scoring +
  // argmax) is what scales, the tables are swappable.
  val EnStop = Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")
  val DeStop = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein")
  val EsStop = Seq("el", "la", "los", "las", "de", "y", "es", "un")
  val FrStop = Seq("le", "les", "des", "est", "et", "une", "dans", "que")

  /**
   * Language id: stopword-profile scores per language, argmax with a minimum
   * confidence threshold, 'und' (undetermined) fallback. Deterministic
   * tie-break order: en > de > es > fr.
   */
  def langId(text: Column, threshold: Double = 0.03): Column = {
    val (en, de, es, fr) = (stopwordRatio(text, EnStop),
      stopwordRatio(text, DeStop), stopwordRatio(text, EsStop),
      stopwordRatio(text, FrStop))
    when(en >= de && en >= es && en >= fr && en >= threshold, "en")
      .when(de >= es && de >= fr && de >= threshold, "de")
      .when(es >= fr && es >= threshold, "es")
      .when(fr >= threshold, "fr")
      .otherwise("und")
  }

  /** Mean word length (exact integer sum folded, then one double divide). */
  def avgWordLen(text: Column): Column = {
    val w = words(text)
    aggregate(transform(w, x => length(x)), lit(0),
      (acc, x) => acc + x).cast("double") / size(w)
  }

  /** Fraction of characters outside [a-z ] (punctuation/digit/upper). */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[a-z ]", "")).cast("double") / length(text)

  /** Composite quality score in [0,1]: stopword presence, length credit,
    * cleanliness (share of [a-z ] characters). */
  def qualityScore(text: Column): Column = {
    val clean = length(regexp_replace(text, "[^a-z ]", "")).cast("double") /
      length(text)
    val lenCredit = least(size(words(text)).cast("double") / 100.0, lit(1.0))
    stopwordRatio(text, EnStop) * 0.3 + lenCredit * 0.3 + clean * 0.4
  }

  /**
   * Document fingerprint (winnowing flavor): lexicographic minimum of the
   * md5 of each shingle — a single stable 128-bit representative that equal
   * or near-equal documents share with high probability.
   */
  def fingerprint(text: Column): Column =
    array_min(transform(shingles(text), s => md5(s)))

  /** Non-distinct word bigrams ("a b"), in document order: n-1 items.
    * zip_with pads the shorter side with null (concat → null) — filtered,
    * as [[shingles]] does. */
  def bigrams(text: Column): Column = {
    val w = words(text)
    filter(
      zip_with(w, slice(w, lit(2), size(w) - 1), (x, y) => concat(x, lit(" "), y)),
      x => x.isNotNull)
  }

  /** Count of the most frequent element of a string array — the array's
    * mode count, computed per row by sorting the array and folding its
    * longest equal run. O(n log n) per row, NO shuffle: the relational
    * alternative (explode → two groupBys) shuffles the whole corpus'
    * token stream twice; this stays a narrow map and runs at scan speed. */
  def maxRepeat(arr: Column): Column =
    aggregate(
      sort_array(arr),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") === x,
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /**
   * Quantile-band quality filter: keep documents whose [[qualityScore]]
   * lies inside the [loQ, hiQ] corpus quantiles — the standard "drop the
   * junk AND the outlier boilerplate" pass. The two thresholds are one
   * tiny aggregate broadcast back over the scan; the corpus itself never
   * shuffles. Exact interpolated percentiles keep the cut reproducible
   * (approx_percentile is the documented knob at 100 TB when an exact
   * global sort of scores is not worth it — same plan shape either way).
   */
  def qualityBand(df: DataFrame, idCol: String, textCol: String,
                  loQ: Double = 0.05, hiQ: Double = 0.95): DataFrame = {
    // lazy localCheckpoint: the scored frame feeds BOTH the bounds
    // aggregate and the filtered scan, and Spark has no cross-branch CSE —
    // without it the regex-heavy score runs twice over the corpus
    val scored = df.select(col(idCol), qualityScore(col(textCol)).as("quality"))
      .localCheckpoint(false)
    val bounds = scored.agg(
      expr(s"percentile(quality, $loQ)").as("__lo"),
      expr(s"percentile(quality, $hiQ)").as("__hi"))
    scored.crossJoin(broadcast(bounds))
      .filter(col("quality") >= col("__lo") && col("quality") <= col("__hi"))
      .select(col(idCol), col("quality"))
  }

  /**
   * Gopher-style repetition stats — the quality signal that catches
   * boilerplate and degenerate generations: the fraction of the document
   * occupied by its single most frequent word and bigram. Documents with
   * fewer than 2 words have no bigrams and are out of scope (filtered).
   *
   * Returns (idCol, n_words, top_word_frac, n_bigrams, top_bigram_frac,
   * repetitive). Pure per-row map work — no shuffle (see [[maxRepeat]]).
   */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      maxWordFrac: Double = 0.3,
                      maxBigramFrac: Double = 0.2,
                      minWords: Int = 7): DataFrame = {
    val w = words(col(textCol))
    df.filter(size(w) >= 2).select(
      col(idCol),
      size(w).cast("long").as("n_words"),
      (maxRepeat(w).cast("double") / size(w)).as("top_word_frac"),
      (size(w) - 1).cast("long").as("n_bigrams"),
      (maxRepeat(bigrams(col(textCol))).cast("double") / (size(w) - 1))
        .as("top_bigram_frac"))
      // the thresholds are degenerate below a length floor: with n words
      // there are n-1 bigrams, so top_bigram_frac >= 1/(n-1) and any doc
      // of <= 1/maxBigramFrac + 1 words trips the default 0.2 even when
      // every bigram is distinct. Gopher applies these filters with a
      // minimum-length gate; minWords = 7 is that floor for the defaults.
      .withColumn("repetitive",
        col("n_words") >= minWords &&
          (col("top_word_frac") >= maxWordFrac ||
            col("top_bigram_frac") >= maxBigramFrac))
  }
}
