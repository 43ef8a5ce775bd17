package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document text counters — the flat-loop scale path of
  * the q25 text-stats signals. The expression route runs several
  * regex/HOF passes per document (split + lookaround split + two
  * regexp_replace + an aggregate fold); this kernel walks the
  * characters once and emits the six integers those expressions
  * divide/compare. The RATIOS and scores stay composed as expressions
  * from these integers, so the arithmetic (and its null semantics) is
  * bit-identical to the expression path — TextSpec pins column-for-
  * column equality corpus-wide plus edge strings.
  *
  * ASCII contract (same as `bpeishTokenCount`): token boundaries are
  * Java `\s` (space, \t, \n, \x0B, \f, \r); `trim` is SPARK's trim
  * (spaces only — NOT Java String.trim); split keeps leading and
  * trailing empty tokens (Java Pattern.split with limit -1, Spark's
  * semantics); letters/digits are [A-Za-z0-9] —
  * non-ASCII letters count as punct exactly as the `[A-Za-z0-9\s]`
  * regex class treats them; astral chars count as their UTF-16 code
  * units, matching Java regex.
  *
  * Output (ARRAY<BIGINT>, fixed layout):
  *   [n_tokens, bpe_tokens, punct_chars, text_chars,
  *    stopword_tokens, token_chars]
  * where n_tokens follows split-semantics — separator-run count + 1
  * over the space-trimmed text (leading/trailing \s runs inside the
  * trimmed region each contribute an empty token; an empty trimmed
  * text yields the single empty token) — and stopword matching is
  * against the lowercased token. */
object TextStats64 {

  /** Must stay in sync with `graft.llm.TextStats.defaultStopwords`. */
  val stopwords: Set[String] =
    Set("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  def text_stats(text: Column): Column =
    GraftSqlBridge.column(TextStatsExpr(GraftSqlBridge.expression(text)))

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' || c == '\r'
  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  def eval(u: UTF8String): ArrayData = {
    val s = u.toString
    val len = s.length
    // trim bounds (SPARK trim: spaces only)
    var lo = 0
    var hi = len
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1

    // full-text counters: punct = NOT [A-Za-z0-9] and NOT \s
    var punct = 0L
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (!isAlpha(c) && !isDigit(c) && !isWs(c)) punct += 1
      i += 1
    }

    // tokens over the trimmed region, SPLIT semantics: token count is
    // separator-run count + 1 (leading/trailing \s runs produce empty
    // tokens, exactly like Pattern.split with limit -1); only the
    // non-empty runs contribute chars / stopword hits
    var nTok = 1L // split always yields at least one (possibly empty) token
    var tokChars = 0L
    var stops = 0L
    i = lo
    while (i < hi) {
      if (isWs(s.charAt(i))) {
        while (i < hi && isWs(s.charAt(i))) i += 1
        nTok += 1 // each separator run adds one more token slot
      } else {
        val start = i
        while (i < hi && !isWs(s.charAt(i))) i += 1
        tokChars += (i - start)
        if (i - start <= 4) { // longest stopword is "that"
          val t = s.substring(start, i).toLowerCase(java.util.Locale.ROOT)
          if (stopwords.contains(t)) stops += 1
        }
      }
    }

    // bpe-ish pieces over the trimmed region: a piece starts at any
    // non-\s char that is (a) first, (b) preceded by \s, (c) a punct
    // char (zero-width boundary BEFORE each punct), or (d) at a
    // letter<->digit transition
    var bpe = 0L
    i = lo
    while (i < hi) {
      val c = s.charAt(i)
      if (!isWs(c)) {
        val first = i == lo
        val prev = if (first) ' ' else s.charAt(i - 1)
        val punctHere = !isAlpha(c) && !isDigit(c)
        val transition = (isAlpha(prev) && isDigit(c)) ||
          (isDigit(prev) && isAlpha(c))
        if (first || isWs(prev) || punctHere || transition) bpe += 1
      }
      i += 1
    }
    ArrayData.toArrayData(Array(nTok, bpe, punct, len.toLong, stops, tokChars))
  }
}

/** Per-profile trigram occurrence counts over " " + lower(text) + " " —
  * the counting half of `TextStats.langIdTrigram` as one flat scan.
  * Counting is greedy non-overlapping left-to-right, which is exactly
  * what the expression form's `(len(t) - len(replace(t, tri))) / 3`
  * measures (SQL replace removes non-overlapping occurrences found in
  * one left-to-right scan). The argmax/tie/und voting stays composed
  * as expressions over these counts, so label semantics cannot drift
  * from the expression path (LlmSpec pins corpus-wide equality).
  * Trigram list rides as a reference object: [profile0-tri0, ...],
  * all EXACTLY 3 chars (the [[graft.llm.TextStats.trigramProfiles]]
  * contract). Returns one count per trigram. */
object TrigramCounts {
  def trigram_counts(text: Column, trigrams: Array[String]): Column = {
    require(trigrams.nonEmpty && trigrams.forall(_.length == 3),
      s"trigrams must be exactly 3 chars: ${trigrams.mkString(",")}")
    GraftSqlBridge.column(TrigramCountsExpr(
      GraftSqlBridge.expression(text), trigrams))
  }

  def eval(u: UTF8String, trigrams: Array[String]): ArrayData = {
    val s = " " + u.toString.toLowerCase(java.util.Locale.ROOT) + " "
    val out = new Array[Long](trigrams.length)
    var t = 0
    while (t < trigrams.length) {
      val tri = trigrams(t)
      var i = s.indexOf(tri)
      var c = 0L
      while (i >= 0) { c += 1; i = s.indexOf(tri, i + 3) }
      out(t) = c
      t += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** See [[TrigramCounts]]; codegen'd, deterministic. */
case class TrigramCountsExpr(child: Expression, trigrams: Array[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected STRING, got $t")
  }
  override def nullSafeEval(text: Any): Any =
    TrigramCounts.eval(text.asInstanceOf[UTF8String], trigrams)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trisRef = ctx.addReferenceObj("trigrams", trigrams, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TrigramCounts.eval($c, $trisRef)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** See [[TextStats64]]; codegen'd, deterministic. */
case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected STRING, got $t")
  }
  override def nullSafeEval(text: Any): Any =
    TextStats64.eval(text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats64.eval($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
