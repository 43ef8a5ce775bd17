package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass-per-stage PII scrub — the fused scale path of the q83
  * redaction signals (reference privacy pass; the 4-pattern contract
  * lives in [[graft.llm.Scrub.patterns]]).
  *
  * The expression route pays EIGHT full-text regex traversals per
  * document (4x `regexp_extract_all` for the audit counts + 4x
  * `regexp_replace`), each converting the UTF8String and driving a
  * backtracking engine. This kernel replaces the regex engine with
  * four hand-rolled deterministic scanners — one per pattern — each
  * producing the stage's replacement text AND exact match count in a
  * single character walk. The staging semantics are preserved exactly
  * (each stage scans its predecessor's OUTPUT, so counts equal the
  * number of replacements that stage makes and an email's digits are
  * never re-counted as a phone).
  *
  * Equivalence argument (pinned corpus-wide + adversarially in
  * CodegenParitySpec/LlmSpec against the regex twin
  * [[graft.llm.Scrub.scrubWithCounts]], which itself is oracle-locked
  * to DuckDB/RE2): every pattern in the set happens to be
  * BACKTRACK-FREE under leftmost-first semantics, because each greedy
  * quantifier's character class excludes the character that must
  * follow it (the email local part cannot contain '@'; the URL body
  * cannot contain whitespace; IP octets cannot contain '.'). So
  * Java's leftmost-first backtracking, RE2's leftmost-first
  * simulation, and these linear scanners all pick the identical
  * match spans. Per pattern:
  *
  *  - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`: a match
  *    starts only at the head of a maximal local-class run whose next
  *    char is '@'; the domain is the maximal domain-class run after
  *    '@', backtracked to the LAST '.' followed by >=2 alphas (larger
  *    split points win because `[A-Za-z0-9.-]+` is greedy and '.' is
  *    inside the class); starts inside a failed local run can never
  *    match (same run end, same '@' test), so the scanner skips runs
  *    whole.
  *  - url `https?://[^ \t\n\r]*[^ \t\n\r.,;:!?)]`: literal prefix,
  *    then the maximal non-whitespace run backtracked to its last
  *    char outside the sentence-punctuation set.
  *  - ip `\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b`: `\d{1,3}\.` can
  *    only match a digit run of EXACT length 1..3 followed by '.'
  *    (a longer run leaves a digit, not '.', under every backtrack),
  *    and the trailing `\b` forces the final run to be <=3 digits
  *    followed by a non-word char; `\b` before the first digit means
  *    candidate starts are exactly digit-run heads with a non-word
  *    predecessor. WORD-BOUNDARY DIALECT: this scanner's `\b` is
  *    RE2's — a word char is ASCII `[A-Za-z0-9_]`, so an IP abutting
  *    a non-ASCII letter/digit ("café1.2.3.4", "1.2.3.4µ") IS
  *    redacted, exactly as DuckDB/RE2 (byte-level `\b`; no multibyte
  *    UTF-8 unit is an ASCII word byte) and therefore as the q83
  *    oracle. Java's `\b` is Unicode-aware even without
  *    UNICODE_CHARACTER_CLASS (verified: `Pattern.find` on
  *    "café1.2.3.4" is false on JDK 17), so the Java-regex twin
  *    [[graft.llm.Scrub.scrubWithCounts]] diverges on exactly those
  *    inputs — the divergence is pinned, both directions, in
  *    CodegenParitySpec ("\b dialect" test).
  *  - phone `\+?\d[\d-]{7,}\d`: within one maximal [0-9-] run the
  *    match is head..last-digit provided that digit sits >=8 chars
  *    past the head; if the EARLIEST start in a run fails, every
  *    later start fails too (its candidate interval is a subset), so
  *    the scanner skips runs whole on failure — and rescans the run
  *    remainder after a success, exactly like `Matcher.find`.
  *
  * All explicit character CLASSES are pure ASCII, so astral/multibyte
  * characters are "not in class" in Java (UTF-16 units), RE2 (bytes)
  * and here (UTF-16 units) alike. The one dialect split is `\b`
  * (IP stage only): Java's is Unicode-aware, RE2's is ASCII/byte —
  * this kernel follows RE2, i.e. the oracle engine; see the IP bullet
  * above. On pure-ASCII neighborhoods all three agree exactly.
  *
  * Output: STRUCT<scrubbed STRING, n_email BIGINT, n_url BIGINT,
  * n_ip BIGINT, n_phone BIGINT>. Null text => null struct (callers
  * that need the regex path's `coalesce(count, 0)` shape apply it on
  * the struct fields, as [[graft.llm.Scrub.scrubWithCountsFused]]
  * does).
  */
object ScrubStats {

  def scrub_stats(text: Column): Column =
    GraftSqlBridge.column(ScrubStatsExpr(GraftSqlBridge.expression(text)))

  val structType: StructType = StructType(Seq(
    StructField("scrubbed", StringType, nullable = false),
    StructField("n_email", LongType, nullable = false),
    StructField("n_url", LongType, nullable = false),
    StructField("n_ip", LongType, nullable = false),
    StructField("n_phone", LongType, nullable = false)))

  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isWord(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '_'
  /** email local-part class [A-Za-z0-9._%+-] */
  @inline private def isLocal(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'
  /** email domain class [A-Za-z0-9.-] */
  @inline private def isDom(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '-'
  /** URL body complement class: [^ \t\n\r] membership */
  @inline private def isUrlBody(c: Char): Boolean =
    c != ' ' && c != '\t' && c != '\n' && c != '\r'
  /** URL final-char exclusions beyond whitespace: .,;:!?) */
  @inline private def isUrlPunct(c: Char): Boolean =
    c == '.' || c == ',' || c == ';' || c == ':' || c == '!' ||
      c == '?' || c == ')'
  /** phone body class [0-9-] */
  @inline private def isPhoneBody(c: Char): Boolean = isDigit(c) || c == '-'

  /** Shared per-stage driver: `find(s, from)` returns the next match
    * as packed (start << 32 | end), or -1L. Builds the replaced text
    * lazily (zero allocation for the no-match common case) and
    * returns the stage count via the 1-slot `countOut`. */
  private def runStage(s: String, token: String, countOut: Array[Long],
      find: (String, Int) => Long): String = {
    var m = find(s, 0)
    if (m < 0L) { countOut(0) = 0L; return s }
    val sb = new java.lang.StringBuilder(s.length)
    var copied = 0
    var n = 0L
    while (m >= 0L) {
      val start = (m >>> 32).toInt
      val end = (m & 0xffffffffL).toInt
      sb.append(s, copied, start).append(token)
      copied = end
      n += 1
      m = find(s, end)
    }
    sb.append(s, copied, s.length)
    countOut(0) = n
    sb.toString
  }

  private def findEmail(s: String, from: Int): Long = {
    val len = s.length
    var i = from
    while (i < len) {
      if (isLocal(s.charAt(i))) {
        // maximal local run
        var a = i
        while (a < len && isLocal(s.charAt(a))) a += 1
        if (a < len && s.charAt(a) == '@') {
          // maximal domain run after '@'
          val dStart = a + 1
          var e = dStart
          while (e < len && isDom(s.charAt(e))) e += 1
          if (e > dStart) {
            // largest k in (dStart, e) with s[k]=='.' and >=2 alphas after
            var k = e - 1
            var found = -1
            while (k > dStart && found < 0) {
              if (s.charAt(k) == '.' && k + 2 < e &&
                  isAlpha(s.charAt(k + 1)) && isAlpha(s.charAt(k + 2)))
                found = k
              else k -= 1
            }
            if (found >= 0) {
              var m = found + 3
              while (m < e && isAlpha(s.charAt(m))) m += 1
              return (i.toLong << 32) | m.toLong
            }
          }
          i = a + 1 // '@' itself can't start a local run
        } else i = a // skip the failed run whole
      } else i += 1
    }
    -1L
  }

  private def findUrl(s: String, from: Int): Long = {
    val len = s.length
    var i = from
    while (i < len) {
      if (s.charAt(i) == 'h' && i + 6 < len && s.charAt(i + 1) == 't' &&
          s.charAt(i + 2) == 't' && s.charAt(i + 3) == 'p') {
        var p = i + 4
        if (p < len && s.charAt(p) == 's') p += 1
        if (p + 2 < len && s.charAt(p) == ':' && s.charAt(p + 1) == '/' &&
            s.charAt(p + 2) == '/') {
          p += 3
          var r = p
          while (r < len && isUrlBody(s.charAt(r))) r += 1
          // backtrack: last char in [p, r) outside the punct set
          var j = r - 1
          while (j >= p && isUrlPunct(s.charAt(j))) j -= 1
          if (j >= p) return (i.toLong << 32) | (j + 1).toLong
        }
      }
      i += 1
    }
    -1L
  }

  private def findIp(s: String, from: Int): Long = {
    val len = s.length
    var i = from
    while (i < len) {
      if (isDigit(s.charAt(i)) && (i == 0 || !isWord(s.charAt(i - 1)))) {
        var p = i
        var ok = true
        var oct = 0
        while (ok && oct < 3) { // first three octets: \d{1,3}\.
          val h = p
          while (p < len && isDigit(s.charAt(p))) p += 1
          if (p - h >= 1 && p - h <= 3 && p < len && s.charAt(p) == '.') p += 1
          else ok = false
          oct += 1
        }
        if (ok) { // final octet: \d{1,3}\b
          val h = p
          while (p < len && isDigit(s.charAt(p))) p += 1
          if (p - h >= 1 && p - h <= 3 && (p == len || !isWord(s.charAt(p))))
            return (i.toLong << 32) | p.toLong
        }
        i += 1 // failed candidate; later digit-run heads need their own \b
      } else i += 1
    }
    -1L
  }

  private def findPhone(s: String, from: Int): Long = {
    val len = s.length
    var i = from
    while (i < len) {
      val c = s.charAt(i)
      val plus = c == '+' && i + 1 < len && isDigit(s.charAt(i + 1))
      if (plus || isDigit(c)) {
        val q = if (plus) i + 1 else i // position of the leading \d
        var e = q + 1
        while (e < len && isPhoneBody(s.charAt(e))) e += 1
        // largest digit j in [q+8, e)
        var j = e - 1
        while (j >= q + 8 && !isDigit(s.charAt(j))) j -= 1
        if (j >= q + 8) return (i.toLong << 32) | (j + 1).toLong
        // earliest start in this [0-9-] run failed => all later starts
        // fail too (their windows are subsets); skip the run whole
        i = e
      } else i += 1
    }
    -1L
  }

  private val tokens = Array("<EMAIL>", "<URL>", "<IP>", "<PHONE>")

  /** Entry point invoked from generated code. */
  def eval(u: UTF8String): InternalRow = {
    var s = u.toString
    val cnt = new Array[Long](1)
    val out = new Array[Any](5)
    s = runStage(s, tokens(0), cnt, findEmail); out(1) = cnt(0)
    s = runStage(s, tokens(1), cnt, findUrl); out(2) = cnt(0)
    s = runStage(s, tokens(2), cnt, findIp); out(3) = cnt(0)
    s = runStage(s, tokens(3), cnt, findPhone); out(4) = cnt(0)
    out(0) = UTF8String.fromString(s)
    new GenericInternalRow(out)
  }
}

/** See [[ScrubStats]]; codegen'd, deterministic. */
case class ScrubStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ScrubStats.structType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected STRING, got $t")
  }
  override def nullSafeEval(text: Any): Any =
    ScrubStats.eval(text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScrubStats.eval($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
