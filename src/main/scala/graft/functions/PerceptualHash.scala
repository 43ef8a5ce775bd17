package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual image hashing (dHash / aHash) over uncompressed 24bpp
  * BMP payloads — the image leg of the near-dup dedup mandate,
  * completing the SimHash text path ([[graft.llm.Dedup]]) with a
  * fingerprint the SAME Hamming-banding infrastructure dedups at
  * scale. Pure byte arithmetic, no codec (container constraint —
  * codec-requiring formats hash to NULL, the documented stub
  * boundary; the plumbing, banding, and verification are real).
  *
  *  - dHash (difference hash): nearest-neighbor downsample to 9×8
  *    grayscale; bit y·8+x is set iff gray(x,y) > gray(x+1,y) — a
  *    gradient-sign sketch robust to brightness/contrast shifts.
  *  - aHash (average hash): downsample to 8×8; bit y·8+x is set iff
  *    64·gray(x,y) > Σgray (the integer-exact mean comparison —
  *    no division, so any engine replays it bit for bit).
  *
  * Grayscale is the channel SUM b+g+r (comparisons are
  * scale-invariant, so the /3 never needs to happen); the NN sample
  * maps target pixel (x,y) to source (x·w/tw, y·h/th), the same
  * convention as [[graft.llm.Multimodal.resizeBmpBytes]] — which
  * makes both hashes EXACTLY invariant under that kernel's integer
  * upscales (PerceptualHashSpec pins dhash(resize2x(img)) ==
  * dhash(img)).
  *
  * Both hashes ride [[BmpHash64]], a codegen'd unary Expression
  * (BINARY → LONG, null on unparseable payloads), so fingerprinting a
  * 10^9-image corpus is one WholeStageCodegen scan, not a boxed UDF.
  */
object PerceptualHash {

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
    ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** Can [[dhash64]]/[[ahash64]] decode this payload? True exactly for
    * plain uncompressed 24bpp BMPs with a complete pixel array — the
    * same predicate [[graft.llm.Multimodal.resizeBmpBytes]] applies. */
  def isHashable(b: Array[Byte]): Boolean =
    b != null && b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte && {
      val dataOff = leInt(b, 10)
      val w = leInt(b, 18)
      val h = math.abs(leInt(b, 22))
      // row stride in LONG: w*3+3 overflows Int near w ~ 7e8, which
      // would slip a wrapped stride past this size guard (the same
      // hardening as resizeBmpBytes) — and |Int.MinValue| is itself
      // negative, so reject that height outright
      w > 0 && h > 0 && leInt(b, 22) != Int.MinValue &&
        leShort(b, 28) == 24 && leInt(b, 30) == 0 &&
        dataOff >= 54 &&
        b.length >= dataOff.toLong + ((w.toLong * 3 + 3) / 4) * 4 * h
    }

  /** Grayscale (channel sum) of source pixel (x, yImg) in IMAGE
    * coordinates (top row = 0), handling bottom-up vs top-down
    * storage via the height sign. Caller guarantees [[isHashable]]. */
  private def graySum(b: Array[Byte], x: Int, yImg: Int): Int = {
    val dataOff = leInt(b, 10)
    val w = leInt(b, 18)
    val hRaw = leInt(b, 22)
    val h = math.abs(hRaw)
    val rowStride = ((w * 3 + 3) / 4) * 4
    val fileRow = if (hRaw > 0) h - 1 - yImg else yImg
    val o = dataOff + fileRow * rowStride + x * 3
    (b(o) & 0xFF) + (b(o + 1) & 0xFF) + (b(o + 2) & 0xFF)
  }

  /** The 9×8 (dHash) or 8×8 (aHash) downsampled gray grid. */
  private def grid(b: Array[Byte], tw: Int, th: Int): Array[Int] = {
    val w = leInt(b, 18)
    val h = math.abs(leInt(b, 22))
    val g = new Array[Int](tw * th)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * h / th).toInt
      var x = 0
      while (x < tw) {
        g(y * tw + x) = graySum(b, (x.toLong * w / tw).toInt, sy)
        x += 1
      }
      y += 1
    }
    g
  }

  /** 64-bit difference hash; caller guarantees [[isHashable]]. */
  def dhash64(b: Array[Byte]): Long = {
    val g = grid(b, 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) > g(y * 9 + x + 1)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** 64-bit average hash; caller guarantees [[isHashable]]. */
  def ahash64(b: Array[Byte]): Long = {
    val g = grid(b, 8, 8)
    var total = 0L
    var i = 0
    while (i < 64) { total += g(i); i += 1 }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (64L * g(i) > total) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Column API: 64-bit dHash of a 24bpp BMP payload, NULL when the
    * payload needs a codec this engine does not carry. */
  def d_hash(payload: Column): Column =
    GraftSqlBridge.column(BmpHash64(
      GraftSqlBridge.expression(payload), dhash = true))

  /** Column API: 64-bit aHash; NULL on unparseable payloads. */
  def a_hash(payload: Column): Column =
    GraftSqlBridge.column(BmpHash64(
      GraftSqlBridge.expression(payload), dhash = false))
}

/** Codegen'd BINARY → LONG perceptual hash (see [[PerceptualHash]]);
  * NULL for payloads [[PerceptualHash.isHashable]] rejects. */
case class BmpHash64(child: Expression, dhash: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected BINARY, got $t")
  }
  private def fn: String = if (dhash) "dhash64" else "ahash64"
  override def nullSafeEval(b: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    if (PerceptualHash.isHashable(bytes))
      (if (dhash) PerceptualHash.dhash64(bytes)
       else PerceptualHash.ahash64(bytes))
    else null
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if (graft.functions.PerceptualHash.isHashable($c)) {
        ${ev.value} = graft.functions.PerceptualHash.$fn($c);
      } else {
        ${ev.isNull} = true;
      }""")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
