package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII-style redaction scrubbing — the privacy pass a training-data
  * pipeline runs before packing: emails, URLs, IPv4 addresses and
  * phone-shaped digit runs are replaced by typed tokens, with EXACT
  * per-pattern match counts (the audit trail; a scrub you cannot
  * count is a scrub you cannot certify).
  *
  * Engine shape: a fold of `regexp_replace` stages over the text
  * column — pure map-side expressions, zero shuffles until the
  * caller's rollup; counts are taken on each stage's INPUT text, so
  * they equal the number of replacements that stage makes (order
  * matters: an email is not later double-counted as a phone because
  * its digits are already `<EMAIL>` by the time the phone stage
  * runs).
  *
  * Every pattern is deliberately restricted to the regex dialect
  * intersection of Java (Spark) and RE2 (DuckDB/oracle): character
  * classes, bounded/unbounded repetition, `\d` — no lookaround, no
  * backreferences, no `\s` (whose class membership differs between
  * the dialects). That is what makes the q83 oracle an exact replay
  * rather than a rows-only check.
  *
  * ONE residual dialect split: the IP pattern's `\b`. RE2's `\b` is
  * byte-level ASCII (`[A-Za-z0-9_]`); Java's is Unicode-aware even
  * without UNICODE_CHARACTER_CLASS. They differ only when an IP
  * abuts a non-ASCII letter/digit ("café1.2.3.4" redacts under RE2,
  * not under Java). The PRODUCTION path (q83 via
  * [[scrubWithCountsFused]]) and the DuckDB oracle both follow RE2's
  * ASCII `\b`; this Java-regexp twin is therefore the divergent one
  * on those inputs, and exists as the parity/readability reference
  * only — the divergence is pinned in CodegenParitySpec.
  */
object Scrub {

  /** (name, pattern, replacement token), applied in order. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    // the final character class keeps sentence-closing punctuation out
    // of the redaction ("see https://x.org/p." redacts the URL, keeps
    // the period) so scrubbed text stays tokenizer-friendly; greedy
    // prefix + required non-punct final char works identically in both
    // dialects, no lookaround needed.
    // ACCEPTED RESIDUE of that trade-off (documented, not fixable in
    // the Java∩RE2 dialect without lookaround/conditionals): (a) a
    // URL whose post-:// tail is ENTIRELY sentence punctuation (e.g.
    // "http://...") is not redacted at all; (b) a URL legitimately
    // ending in ')' (Wikipedia-style "..._(disambiguation)") keeps
    // its closing paren outside the redaction, leaving "<URL>)". Both
    // shapes carry no PII beyond the already-redacted prefix chars,
    // and matching ')' conditionally on a preceding '(' is not
    // expressible in RE2; callers needing stricter paren handling
    // should post-process.
    ("url", "https?://[^ \\t\\n\\r]*[^ \\t\\n\\r.,;:!?)]", "<URL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+?\\d[\\d-]{7,}\\d", "<PHONE>"))

  /** Fully scrubbed text (all stages applied in order). */
  def scrubbed(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, p, r)) => regexp_replace(c, p, r) }

  /** Input rewritten with `scrubbed_<textCol>` plus one `n_<name>`
    * exact match count per pattern (counted stage-sequentially, so
    * Σcounts = number of replacements performed).
    *
    * This is the REGEX-EXPRESSION twin: 8 full-text regex traversals
    * per document. It exists as the oracle-shaped reference
    * implementation and the parity pin for the fused kernel below —
    * production callers (q83) use [[scrubWithCountsFused]], which
    * computes the identical columns in one expression with four
    * linear scans (see [[graft.functions.ScrubStats]] for the
    * backtrack-freeness argument that makes them equivalent). */
  def scrubWithCounts(df: DataFrame, textCol: String): DataFrame = {
    val seeded = df.withColumn(s"scrubbed_$textCol", col(textCol))
    patterns.foldLeft(seeded) { case (d, (name, p, r)) =>
      d.withColumn(s"n_$name",
          coalesce(size(regexp_extract_all(col(s"scrubbed_$textCol"),
            lit(p), lit(0))), lit(0)))
        .withColumn(s"scrubbed_$textCol",
          regexp_replace(col(s"scrubbed_$textCol"), p, r))
    }
  }

  /** Fused scale path: same output columns as [[scrubWithCounts]]
    * (null text => null scrubbed text, zero counts — the regex
    * path's `coalesce(size(...), 0)` shape), one codegen'd kernel
    * call per row instead of 8 regex passes. */
  def scrubWithCountsFused(df: DataFrame, textCol: String): DataFrame = {
    val sc = graft.functions.ScrubStats.scrub_stats(col(textCol))
    val withStruct = df.withColumn("__scrub", sc)
    val out = withStruct
      .withColumn(s"scrubbed_$textCol", col("__scrub.scrubbed"))
    patterns.foldLeft(out) { case (d, (name, _, _)) =>
      d.withColumn(s"n_$name", coalesce(col(s"__scrub.n_$name"), lit(0L)))
    }.drop("__scrub")
  }
}
