package graft.functions

import org.apache.spark.sql.Column
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
}
