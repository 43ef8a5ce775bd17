package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Encoding-anomaly detection — the mojibake/control-character audit a
  * training-data pipeline runs on crawled text (the C4/CCNet cleaning
  * family; the batch-side sibling of the reference's ingest encoding
  * ladder, `io/Sinks.scala` S5/F26: the ladder fixes files whose
  * DECLARED encoding is recoverable, this gate counts the damage
  * inside strings that already decoded "successfully").
  *
  * Four exact per-document signals, each a pattern count:
  *  - `repl`: U+FFFD replacement characters — a decoder already gave
  *    up somewhere upstream;
  *  - `moji`: UTF-8-read-as-Latin-1 double-encoding signatures — 'Ã'
  *    (U+00C3, the Latin-1 face of a UTF-8 2-byte lead) followed by a
  *    continuation-range character U+0080-U+00BF ("cafÃ©");
  *  - `c0`: C0 control characters other than tab/newline/CR;
  *  - `c1`: C1 controls U+0080-U+009F — the cp1252/Latin-1 confusion
  *    band (NEL, etc.) that tokenizers and terminals both mangle.
  *
  * Patterns live in the Java∩RE2 dialect intersection (literal chars
  * + `\xhh` classes, no shorthand whose membership differs), so the
  * DuckDB oracle replays the counts exactly — the q83 discipline.
  * Counts are independent (a continuation char after 'Ã' that falls
  * in U+0080-U+009F is counted by BOTH moji and c1; each signal
  * answers its own question).
  */
object Encoding {

  /** (name, pattern) — identical strings on both engines (unicode
    * escapes resolve to literal chars at compile time, so the SQL side
    * receives the same literal characters). */
  val patterns: Seq[(String, String)] = Seq(
    ("repl", "�"),
    ("moji", "Ã[\\x80-\\xbf]"),
    ("c0", "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"),
    ("c1", "[\\x80-\\x9f]"))

  /** Input plus one exact `n_<name>` count per signal and a `clean`
    * boolean (all four zero) — the keep gate. */
  def anomalyCounts(df: DataFrame, textCol: String): DataFrame = {
    val reserved = patterns.map(p => s"n_${p._1}") :+ "clean"
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"anomalyCounts writes ${reserved.mkString(", ")}; input already has " +
        s"${clash.mkString(", ")} — rename before calling")
    val counted = patterns.foldLeft(df) { case (d, (name, p)) =>
      d.withColumn(s"n_$name",
        coalesce(size(regexp_extract_all(col(textCol), lit(p), lit(0))),
          lit(0)).cast("long"))
    }
    counted.withColumn("clean",
      patterns.map(p => col(s"n_${p._1}") === 0L).reduce(_ && _))
  }

  /** Per-group audit rollup: docs, clean docs, per-signal totals. */
  def anomalyRollup(df: DataFrame, textCol: String,
                    groupCol: String): DataFrame = {
    val aggs = count(lit(1)).as("n_docs") +:
      sum(when(col("clean"), 1L).otherwise(0L)).as("clean_docs") +:
      patterns.map(p => sum(col(s"n_${p._1}")).as(s"${p._1}_total"))
    anomalyCounts(df, textCol)
      .groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
  }
}
