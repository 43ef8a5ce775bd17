package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** Perceptual image hashing (dHash / aHash) over image payloads — the
  * image leg of the near-dup dedup mandate, completing the SimHash
  * text path ([[graft.llm.Dedup]]) with a fingerprint the SAME
  * Hamming-banding infrastructure dedups at scale. Two decode paths
  * feed one grid/bit pipeline:
  *
  *  - uncompressed 24bpp BMP: pure byte arithmetic, zero-copy off the
  *    payload array (the fast path, and the only one a SQL oracle can
  *    replay bit for bit — q80 pins it);
  *  - PNG / JPEG / GIF (magic-sniffed): JDK `javax.imageio` decode —
  *    no external libraries — into the same nearest-neighbor gray
  *    grid. PNG/GIF are lossless, so their hashes equal the BMP
  *    twin's EXACTLY (MultimodalSpec pins hash(png(img)) ==
  *    hash(bmp(img)) with ImageIO as an independent second decoder);
  *    JPEG is lossy, so its hash lands within a small Hamming radius
  *    of the twin (spec-pinned), which is precisely what a
  *    NEAR-duplicate detector wants — re-encoded copies land in the
  *    same Hamming buckets. JPEG decode is deterministic within one
  *    JDK but NOT pinned across JDK implementations; a cluster must
  *    run one JDK (true of any Spark deployment) for fingerprints to
  *    be comparable across executors.
  *
  * Anything else hashes to NULL.
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

  /** Same grid off an ImageIO-decoded image — IDENTICAL sampling
    * convention (target (x,y) ← source (x·w/tw, y·h/th)) and gray
    * convention (channel sum r+g+b), so a losslessly re-encoded image
    * hashes exactly like its BMP twin. Alpha ignored (hash of what's
    * painted, not of transparency). */
  private def gridFromImage(img: java.awt.image.BufferedImage,
                            tw: Int, th: Int): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val g = new Array[Int](tw * th)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * h / th).toInt
      var x = 0
      while (x < tw) {
        val rgb = img.getRGB((x.toLong * w / tw).toInt, sy)
        g(y * tw + x) =
          ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    g
  }

  private def dhashBits(g: Array[Int]): Long = {
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

  private def ahashBits(g: Array[Int]): Long = {
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

  /** 64-bit difference hash; caller guarantees [[isHashable]]. */
  def dhash64(b: Array[Byte]): Long = dhashBits(grid(b, 9, 8))

  /** 64-bit average hash; caller guarantees [[isHashable]]. */
  def ahash64(b: Array[Byte]): Long = ahashBits(grid(b, 8, 8))

  /** Magic-byte sniff for the codec formats the JDK decodes natively.
    * Deliberately narrow: an unknown format should hash NULL, not be
    * fed to ImageIO on spec. */
  def looksLikeCodec(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && (
      (b(0) == 0x89.toByte && b(1) == 'P'.toByte &&
        b(2) == 'N'.toByte && b(3) == 'G'.toByte) ||        // PNG
      ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
        (b(2) & 0xFF) == 0xFF) ||                           // JPEG
      (b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
        b(2) == 'F'.toByte && b(3) == '8'.toByte))          // GIF87a/89a

  // ImageIO's default stream cache spills every decode through a temp
  // FILE — catastrophic for a hot fingerprint loop. In-memory cache
  // only; set once, idempotent, and the only global it touches is
  // ImageIO's own caching knob.
  private lazy val imageIoReady: Boolean = {
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

  /** Pixel cap for codec decodes: a header-declared dimension beyond
    * this hashes NULL instead of being decoded. An untrusted corpus
    * can carry decompression bombs — a few-KB PNG/GIF whose header
    * declares e.g. 100k x 100k forces ImageIO.read to allocate
    * width*height*4 bytes BEFORE any payload byte is found invalid,
    * and the resulting OutOfMemoryError is not a catchable data error
    * (it kills the task, and Spark's retries just re-kill it). 64M px
    * (~256 MB ARGB) is far above any sane training image and far
    * below the allocation that topples an executor. */
  val maxCodecPixels: Long = 64L * 1024 * 1024

  /** Boxed hashing entry for the codegen'd kernel: raw-BMP fast path,
    * ImageIO codec fallback (PNG/JPEG/GIF), NULL (java null) when
    * neither decodes — or when the header's declared dimensions
    * exceed [[maxCodecPixels]] (bomb guard: dimensions are read from
    * the header via ImageReader BEFORE the pixel buffer exists). */
  def hash64(b: Array[Byte], dhash: Boolean): java.lang.Long = {
    if (b == null) null
    else if (isHashable(b))
      java.lang.Long.valueOf(if (dhash) dhash64(b) else ahash64(b))
    else if (looksLikeCodec(b)) {
      val img = decodeCodec(b)
      if (img == null) null
      else java.lang.Long.valueOf(
        if (dhash) dhashBits(gridFromImage(img, 9, 8))
        else ahashBits(gridFromImage(img, 8, 8)))
    } else null
  }

  /** ImageIO decode of a codec payload with the bomb guard; null on
    * anything that fails to decode — the shared tail of [[hash64]]
    * and [[hash128]], factored out so the WIDE fingerprint pays ONE
    * decode for both hashes. */
  private def decodeCodec(b: Array[Byte]): java.awt.image.BufferedImage = {
    val _ = imageIoReady
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            // header-only: no pixel allocation happens for these
            val w = reader.getWidth(0).toLong
            val h = reader.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > maxCodecPixels) null
            else reader.read(0)
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch {
      // truncated/corrupt payloads surface as IIOException/IOException
      // (and some broken streams as RuntimeException inside plugins);
      // a corrupt image is data, not a bug — hash NULL, keep scanning
      case _: java.io.IOException => null
      case _: RuntimeException => null
    }
  }

  /** The WIDE fingerprint: dHash (element 0 — the wide banding's
    * `lo` half) and aHash (element 1 — `hi`) of ONE decode, null when
    * the payload decodes under no supported format. Bit-identical to
    * `[hash64(b, true), hash64(b, false)]` (spec-pinned) but decodes
    * codec payloads ONCE where two kernel calls decode twice — at a
    * 10^9-image corpus the decode IS the fingerprint cost, so the
    * wide path must not double it. */
  def hash128(b: Array[Byte]): Array[Long] = {
    if (b == null) null
    else if (isHashable(b))
      Array(dhash64(b), ahash64(b))
    else if (looksLikeCodec(b)) {
      val img = decodeCodec(b)
      if (img == null) null
      else Array(dhashBits(gridFromImage(img, 9, 8)),
        ahashBits(gridFromImage(img, 8, 8)))
    } else null
  }

  /** [[hash128]] as an InternalRow (dh, ah) for the codegen'd struct
    * expression; java null when unhashable. */
  def hash128Row(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val h = hash128(b)
    if (h == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](h(0), h(1)))
  }

  /** Column API: 64-bit dHash of a BMP/PNG/JPEG/GIF payload, NULL
    * when the payload decodes under none of them. */
  def d_hash(payload: Column): Column =
    GraftSqlBridge.column(BmpHash64(
      GraftSqlBridge.expression(payload), dhash = true))

  /** Column API: 64-bit aHash; NULL on unparseable payloads. */
  def a_hash(payload: Column): Column =
    GraftSqlBridge.column(BmpHash64(
      GraftSqlBridge.expression(payload), dhash = false))

  /** Column API: the 128-bit wide fingerprint as STRUCT<dh: BIGINT,
    * ah: BIGINT> from ONE decode ([[hash128]]); NULL struct on
    * unparseable payloads. Feed `dh` as the wide banding's `lo` half
    * and `ah` as `hi` ([[graft.llm.Multimodal.imageNearDupPairsWide]]
    * does). */
  def d_a_hash(payload: Column): Column =
    GraftSqlBridge.column(BmpHash128(GraftSqlBridge.expression(payload)))
}

/** Codegen'd BINARY → LONG perceptual hash (see [[PerceptualHash]]):
  * raw 24bpp-BMP fast path plus JDK ImageIO codec fallback; NULL for
  * payloads neither decodes. (Name kept from the BMP-only era — it is
  * the hash REGISTER width that's 64, not the format.) */
case class BmpHash64(child: Expression, dhash: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected BINARY, got $t")
  }
  override def nullSafeEval(b: Any): Any =
    PerceptualHash.hash64(b.asInstanceOf[Array[Byte]], dhash)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { c =>
      val h = ctx.freshName("phash")
      s"""
      java.lang.Long $h = graft.functions.PerceptualHash.hash64($c, $dhash);
      if ($h != null) {
        ${ev.value} = $h.longValue();
      } else {
        ${ev.isNull} = true;
      }"""
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Codegen'd BINARY → STRUCT<dh: BIGINT, ah: BIGINT> wide perceptual
  * fingerprint (see [[PerceptualHash.hash128]]): both hashes from ONE
  * decode; NULL for payloads no supported format decodes. */
case class BmpHash128(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("dh", LongType, nullable = false),
    StructField("ah", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected BINARY, got $t")
  }
  override def nullSafeEval(b: Any): Any =
    PerceptualHash.hash128Row(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { c =>
      val r = ctx.freshName("phash128")
      s"""
      org.apache.spark.sql.catalyst.InternalRow $r =
        graft.functions.PerceptualHash.hash128Row($c);
      if ($r != null) {
        ${ev.value} = $r;
      } else {
        ${ev.isNull} = true;
      }"""
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
