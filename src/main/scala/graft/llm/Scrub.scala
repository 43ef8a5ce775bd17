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
  * classes, bounded/unbounded repetition, `\d`, `\b` — no
  * lookaround, no backreferences, no `\s` (whose class membership
  * differs between the dialects). That is what makes the q83 oracle
  * an exact replay rather than a rows-only check.
  */
object Scrub {

  /** (name, pattern, replacement token), applied in order. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    // the final character class keeps sentence-closing punctuation out
    // of the redaction ("see https://x.org/p." redacts the URL, keeps
    // the period) so scrubbed text stays tokenizer-friendly; greedy
    // prefix + required non-punct final char works identically in both
    // dialects, no lookaround needed
    ("url", "https?://[^ \\t\\n\\r]*[^ \\t\\n\\r.,;:!?)]", "<URL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+?\\d[\\d-]{7,}\\d", "<PHONE>"))

  /** Fully scrubbed text (all stages applied in order). */
  def scrubbed(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, p, r)) => regexp_replace(c, p, r) }

  /** Input rewritten with `scrubbed_<textCol>` plus one `n_<name>`
    * exact match count per pattern (counted stage-sequentially, so
    * Σcounts = number of replacements performed). */
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
}
