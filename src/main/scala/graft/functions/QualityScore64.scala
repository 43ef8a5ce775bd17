package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** fastText-style linear document-quality scoring (Joulin et al. 2016,
  * "Bag of Tricks for Efficient Text Classification" — the standard
  * learned quality gate in RefinedWeb/DCLM-class corpus pipelines):
  * hashed word uni+bigram features, a fixed weight table, score =
  * Σ w[h(g) mod D] over the document's grams. INFERENCE only —
  * training is out of scope; the weight table is a fixture (a
  * deterministic integer avalanche of the bucket index, so the SQL
  * oracle recomputes any weight from the bucket alone and no
  * 1024-literal table ever appears in a query plan or the oracle).
  *
  * Exact-integer contract (what makes q85 a hash-gated oracle row):
  *  - tokens are the alnum alphabet ([[graft.llm.Bpe.alnumTokens]]'s
  *    `^[a-z0-9]+$` over whitespace-split lower(trim(text))) — pure
  *    ASCII, so Java chars == UTF-8 bytes == Unicode codepoints and
  *    both engines hash identical sequences;
  *  - gram hash: polynomial fold h ← (31·h + c) mod (2^31−1), seed 7,
  *    over the gram's characters (bigrams joined by a single space);
  *  - weight(j) ∈ [−500, 500]: two avalanche rounds of (j+1), mod
  *    1001, minus 500;
  *  - the keep gate compares 1000·Σw > θ_milli·n_grams — cross-
  *    multiplied, so neither engine ever divides (integer division
  *    rounds differently in Scala and SQL for negatives).
  *
  * The kernel is one codegen'd ARRAY<STRING> → ARRAY<BIGINT>
  * [weight_sum, n_grams] map-side pass: each token's bytes are folded
  * once for its unigram and once more as the tail of the following
  * bigram (the bigram fold RESUMES from the previous token's unigram
  * state — prefix property of the polynomial hash — so nothing is
  * ever concatenated or re-scanned). */
object QualityScore64 {

  /** Hash buckets (feature dimension). */
  val Dim = 1024
  /** Polynomial-hash seed (non-zero so "" and missing differ). */
  val HashInit = 7L
  /** Mersenne prime 2^31−1 — the shared modulus of this repo's
    * SQL-replayable hashes. */
  val Mod = 2147483647L
  /** Keep-gate threshold, milli-units of mean gram weight. */
  val ThetaMilli = 25L

  /** Fixture weight for bucket j — deterministic, recomputable by the
    * oracle from j alone. */
  def weight(j: Int): Int = {
    var v = Math.floorMod((j + 1L) * 2654435761L, Mod)
    v = Math.floorMod((v ^ (v >> 15)) * 2246822519L, Mod)
    ((v % 1001L) - 500L).toInt
  }

  private val table: Array[Int] = Array.tabulate(Dim)(weight)

  /** [weight_sum, n_grams] over alnum tokens (uni+bigrams). */
  def quality_score(tokens: Column): Column =
    GraftSqlBridge.column(QualityScoreExpr(GraftSqlBridge.expression(tokens)))

  def eval(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var sumW = 0L
    var grams = 0L
    var prevH = -1L // unigram hash state of the previous token
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        prevH = -1L // defensive: a null token breaks adjacency
      } else {
        val bytes = arr.getUTF8String(i).getBytes
        var h = HashInit
        var j = 0
        while (j < bytes.length) {
          h = (h * 31L + (bytes(j) & 0xFF)) % Mod
          j += 1
        }
        sumW += table((h % Dim).toInt)
        grams += 1
        if (prevH >= 0) {
          var bh = (prevH * 31L + 32L) % Mod // ' ' joiner
          j = 0
          while (j < bytes.length) {
            bh = (bh * 31L + (bytes(j) & 0xFF)) % Mod
            j += 1
          }
          sumW += table((bh % Dim).toInt)
          grams += 1
        }
        prevH = h
      }
      i += 1
    }
    ArrayData.toArrayData(Array(sumW, grams))
  }
}

/** See [[QualityScore64]]; codegen'd, deterministic. */
case class QualityScoreExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected ARRAY<STRING>, got $t")
  }
  override def nullSafeEval(tokens: Any): Any =
    QualityScore64.eval(tokens.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityScore64.eval($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
