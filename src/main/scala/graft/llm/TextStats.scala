package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over a
  * `documents(doc_id, text, lang, source, n_chars)` table: tokenization
  * counts, quality scoring, language-ID heuristics, fingerprinting.
  *
  * Everything here is built-in expression chains (codegen'd, no UDFs) so
  * the operators run at full scan speed — at 100 TB these are the
  * map-side of every corpus-curation job and must not leave
  * WholeStageCodegen.
  */
object TextStats {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: word-piece boundaries at letter/
    * digit/punct transitions (a cheap deterministic proxy for a real
    * tokenizer — the regex splits where a byte-pair tokenizer typically
    * would; full BPE needs a vocab file, out of scope per container).
    * Boundaries are zero-width (lookarounds), so pieces keep every
    * character. Java regex is UTF-16: an astral-plane char (emoji)
    * counts as two punct units — fine for a filtering signal, but only
    * ASCII/BMP text is bit-identical to the q25 DuckDB twin. */
  def bpeishTokenCount(text: Column): Column =
    size(filter(
      split(trim(text), "(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|\\s+|(?=[^a-zA-Z0-9\\s])"),
      c => length(c) > 0))

  /** Ratio of characters that are not alphanumeric/space — high values
    * flag markup/binary junk. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Fraction of tokens that are English stopwords. */
  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*))).cast("double")
        / size(toks))
      .otherwise(lit(0.0))
  }

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: length sweet spot, low punct
    * noise, presence of stopwords (prose-ness). Weights mirror common
    * corpus-filtering recipes (e.g. Gopher/C4-style rules). */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val lenScore = when(nTok >= 20 && nTok <= 1000, 1.0)
      .when(nTok >= 5, 0.5).otherwise(0.0)
    val punctScore = when(punctRatio(text) < 0.1, 1.0)
      .when(punctRatio(text) < 0.3, 0.5).otherwise(0.0)
    val stopScore = when(stopwordRatio(text) > 0.05, 1.0).otherwise(0.3)
    round(lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3, 4)
  }

  /** Language-ID heuristic: marker-stopword voting (n-gram-free variant;
    * a real system would use char-trigram profiles — this is the
    * deterministic expression-only form, precision limited by design). */
  def langIdHeuristic(text: Column): Column = {
    val t = concat(lit(" "), lower(text), lit(" "))
    when(t.contains(" le ") || t.contains(" la ") || t.contains(" et "), "fr")
      .when(t.contains(" el ") || t.contains(" los ") || t.contains(" y "), "es")
      .when(t.contains(" der ") || t.contains(" und ") || t.contains(" die "), "de")
      .when(t.contains(" the ") || t.contains(" and ") || t.contains(" of "), "en")
      .otherwise("und")
  }

  /** Char-trigram profiles for [[langIdTrigram]] — a handful of
    * high-frequency trigrams per language, ASCII-only (the fixture
    * contract) and each EXACTLY 3 chars so occurrence counts divide by
    * a constant. Cross-language collisions ("nd " fires on German
    * "und" too) are fine: scoring is per-profile voting, and real text
    * hits its own profile far more often. */
  val trigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", " an", "ing", " of", "nd "),
    "fr" -> Seq(" le", " la", " et", "une", "ais"),
    "es" -> Seq(" el", "los", " y ", "cio", "ado"),
    "de" -> Seq("der", "ein", "und", "sch", "ich"))

  /** Language-ID, n-gram form: count each profile's trigram occurrences
    * (`(len(t) - len(replace(t, tri))) / 3` — pure string expressions,
    * no regex, no UDF), argmax with ties breaking toward earlier
    * profile order, and "und" for null text or when every profile
    * scores zero. The argmax chain is FOLDED over [[trigramProfiles]]
    * (labels and tie order come from the constant, never hardcoded —
    * q54's generated SQL twin folds the same way, so adding or
    * reordering a language updates both sides together). The
    * statistically-real sibling of [[langIdHeuristic]]'s marker-word
    * voting; both are deterministic and SQL-twin-expressible. */
  def langIdTrigram(text: Column): Column = {
    val t = concat(lit(" "), lower(text), lit(" "))
    def score(tris: Seq[String]): Column =
      tris.map(tri => (length(t) - length(replace(t, lit(tri), lit("")))) / lit(3))
        .reduce(_ + _)
    val scores = trigramProfiles.map { case (lang, tris) => lang -> score(tris) }
    val total = scores.map(_._2).reduce(_ + _)
    val argmax = scores.zipWithIndex.foldRight(lit(scores.last._1): Column) {
      case (((lang, s), i), acc) =>
        val later = scores.drop(i + 1).map(_._2)
        if (later.isEmpty) acc
        else when(later.map(s >= _).reduce(_ && _), lang).otherwise(acc)
    }
    when(text.isNull || total === 0, "und").otherwise(argmax)
  }

  /** [[trigramProfiles]] flattened in profile order — the reference
    * array [[graft.functions.TrigramCounts.trigram_counts]] consumes. */
  def profileTrigrams: Array[String] = trigramProfiles.flatMap(_._2).toArray

  /** [[langIdTrigram]]'s voting over kernel-counted trigram occurrences
    * — identical argmax/tie/und semantics over the same counts (the
    * kernel's greedy non-overlapping scan measures exactly what the
    * replace-length expression measures; LlmSpec pins corpus-wide
    * label equality). `countsCol` must be
    * `TrigramCounts.trigram_counts(text, profileTrigrams)` materialized
    * in a prior select so the 20 element_at reads share one kernel
    * evaluation. */
  def langIdTrigramFromCounts(text: Column, countsCol: Column): Column = {
    val offsets = trigramProfiles.scanLeft(0)(_ + _._2.length)
    val scores = trigramProfiles.zipWithIndex.map { case ((lang, ts), pi) =>
      lang -> ts.indices
        .map(j => element_at(countsCol, offsets(pi) + j + 1))
        .reduce(_ + _)
    }
    val total = scores.map(_._2).reduce(_ + _)
    val argmax = scores.zipWithIndex.foldRight(lit(scores.last._1): Column) {
      case (((lang, s), i), acc) =>
        val later = scores.drop(i + 1).map(_._2)
        if (later.isEmpty) acc
        else when(later.map(s >= _).reduce(_ && _), lang).otherwise(acc)
    }
    when(text.isNull || total === 0, "und").otherwise(argmax)
  }

  /** The q25 signal set composed from the one-pass
    * [[graft.functions.TextStats64]] counting kernel instead of the
    * regex/HOF expression chains — identical columns, identical
    * arithmetic (the divisions/when-trees are the SAME expressions,
    * fed by kernel-counted integers; null semantics preserved, e.g.
    * punct_ratio of empty text is null on both paths). LlmSpec pins
    * column-for-column equality against the expression functions
    * corpus-wide plus edge strings. Returns columns named exactly as
    * q25 emits them; `stCol` must be `TextStats64.text_stats(text)`
    * materialized in a prior select. */
  def kernelSignalColumns(stCol: Column): Seq[Column] = {
    def el(i: Int): Column = element_at(stCol, i)
    val nTok = el(1)
    val pr = when(el(4) > 0, el(3).cast("double") / el(4)).otherwise(lit(0.0))
    val sr = when(nTok > 0, el(5).cast("double") / nTok).otherwise(lit(0.0))
    val lenScore = when(nTok >= 20 && nTok <= 1000, 1.0)
      .when(nTok >= 5, 0.5).otherwise(0.0)
    val punctScore = when(pr < 0.1, 1.0).when(pr < 0.3, 0.5).otherwise(0.0)
    val stopScore = when(sr > 0.05, 1.0).otherwise(0.3)
    Seq(
      nTok.cast("int").as("n_tokens"),
      el(2).cast("int").as("bpe_tokens"),
      pr.as("punct_ratio"),
      sr.as("stopword_ratio"),
      when(nTok > 0, el(6).cast("double") / nTok).otherwise(lit(0.0))
        .as("avg_token_len"),
      round(lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3, 4)
        .as("quality_score"))
  }

  /** Canonical-form document fingerprint: md5 of lowercased,
    * whitespace-collapsed text. Exact-dup detection key. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** Polynomial rolling hash over tokens (Rabin-Karp style) — an
    * order-sensitive fingerprint that, unlike md5-of-whole-text, can be
    * computed incrementally per shingle window. Backed by the codegen'd
    * [[graft.functions.RollingHash64]] Expression: the `aggregate` HOF
    * form both runs interpreted and throws ARITHMETIC_OVERFLOW under
    * ANSI semantics once the polynomial wraps — wrap-around IS the
    * hash, so the arithmetic must be Java's. */
  def rollingHash(text: Column): Column =
    graft.functions.RollingHash64.rollingHash64(tokens(text))

}
