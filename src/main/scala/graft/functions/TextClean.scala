package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text normalization and PII redaction — the cleaning passes a training-data
 * pipeline runs before dedup/quality filtering (SURVEY §2.6 extension set;
 * the reference has no text processing at all, these are capability
 * extensions alongside [[TextFns]]).
 *
 * All pure Column work (codegen'd regexp/string expressions — no UDFs), so
 * the passes are narrow maps: no shuffle, pushdown-transparent, and at
 * 100 TB they run at scan speed. Patterns are deliberately restricted to
 * syntax shared by Java regex and RE2 (no backreferences, no lookaround) so
 * engines and oracles can't drift.
 */
object TextClean {

  /** Email address (conservative, RE2-compatible). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic — no octet range check). */
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Long digit runs (ids, phone-ish numbers, SSNs without separators). */
  val LongNumRe = "[0-9]{7,}"

  /**
   * Canonical text normalization: lowercase, collapse whitespace runs to a
   * single space, trim. The standard pre-pass before hashing/shingling so
   * that case and spacing differences don't defeat dedup.
   */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /**
   * PII redaction: emails, then IPv4s, then long digit runs are replaced
   * with stable tokens. Order matters — emails and IPs contain digit runs,
   * so they must be consumed before the catch-all number pass.
   */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      LongNumRe, "<NUM>")

  /** Count of non-overlapping matches of `re` in the column. */
  def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0)))
}
