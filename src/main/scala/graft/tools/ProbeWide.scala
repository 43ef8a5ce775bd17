package graft.tools

import graft.functions.{AudioFingerprint, PerceptualHash}
import graft.llm.Multimodal

/** Dev probe (round 17): the 128-bit fingerprint threshold
  * measurement that gates the wide-banding design — BEFORE any
  * operator exists. For every fixture family (dense image, sparse
  * image, JPEG re-encode twins, dense/sparse audio) it reports, for
  * the TRUE pairs of the current 64-bit h≤7 operating point, the
  * distribution of the companion-hash distance (aHash for images) and
  * of the combined 128-bit distance — plus the closest NON-pair's
  * 128-bit distance (the separation margin). The wide path's
  * `maxHamming` must sit at or above the max true-pair h128 (recall
  * 1.0 vs the 64-bit contract) and well under the non-pair margin.
  * Driver-side brute force; no Spark session. */
object ProbeWide {

  // ---- REFUTED companion-hash candidates, kept here as measurement
  // replicas only (the shipped kernel is AudioFingerprint.fpWide, the
  // doubled 17×8 grid). avg: mean comparisons flip for cells NEAR the
  // mean → true pairs spread to h128=31 with non-pairs at 8. vert:
  // better (max 17) but still overlapping the non-pair margin (8).
  private def cellEnergies(b: Array[Byte], cells: Int): Array[Long] = {
    val blockAlign = (b(32) & 0xFF) | ((b(33) & 0xFF) << 8)
    val declared = ((b(40) & 0xFF).toLong | ((b(41) & 0xFF).toLong << 8) |
      ((b(42) & 0xFF).toLong << 16) | ((b(43) & 0xFF).toLong << 24))
    val n = (math.min(declared, (b.length - 44).toLong) / blockAlign).toInt
    val e = new Array[Long](cells)
    var k = 0
    while (k < cells) {
      val start = (k.toLong * n / cells).toInt
      val end = ((k + 1).toLong * n / cells).toInt
      var acc = 0L
      var i = start
      while (i < end) {
        val off = 44 + i * blockAlign
        val s = (((b(off) & 0xFF) | (b(off + 1) << 8)).toShort).toInt
        acc += s.toLong * s
        i += 1
      }
      e(k) = acc
      k += 1
    }
    e
  }
  private def fpAvg64(b: Array[Byte]): Long = {
    val e = cellEnergies(b, 64)
    var total = 0L
    var i = 0
    while (i < 64) { total += e(i); i += 1 }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (e(i) > total / 64) hash |= 1L << i
      i += 1
    }
    hash
  }
  private def fpVert64(b: Array[Byte]): Long = {
    val e = cellEnergies(b, 72)
    var hash = 0L
    var y = 0
    while (y < 7) {
      var x = 0
      while (x < 9) {
        if (e(y * 9 + x) > e((y + 1) * 9 + x)) hash |= 1L << (y * 9 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3000)

    def report(name: String, ids: Seq[Long],
               lo: Long => Long, hi: Long => Long): Unit = {
      val l = ids.map(id => id -> lo(id)).toMap
      val h = ids.map(id => id -> hi(id)).toMap
      def bc(x: Long) = java.lang.Long.bitCount(x)
      var h128True = scala.collection.mutable.Map[Int, Int]()
      var hCompTrue = scala.collection.mutable.Map[Int, Int]()
      var maxTrue128 = -1
      var minNon128 = Int.MaxValue
      var nTrue = 0L
      for (a <- ids; b <- ids if a < b) {
        val d64 = bc(l(a) ^ l(b))
        val dC = bc(h(a) ^ h(b))
        val d128 = d64 + dC
        if (d64 <= 7) {
          nTrue += 1
          h128True(d128) = h128True.getOrElse(d128, 0) + 1
          hCompTrue(dC) = hCompTrue.getOrElse(dC, 0) + 1
          if (d128 > maxTrue128) maxTrue128 = d128
        } else if (d128 < minNon128) minNon128 = d128
      }
      println(s"== $name: ids=${ids.size} truePairs=$nTrue")
      println(s"   comp-dist histogram: " +
        hCompTrue.toSeq.sortBy(_._1).map { case (k, v) => s"$k:$v" }.mkString(" "))
      println(s"   h128 histogram:      " +
        h128True.toSeq.sortBy(_._1).map { case (k, v) => s"$k:$v" }.mkString(" "))
      println(s"   maxTrue128=$maxTrue128 minNonPair128=$minNon128")
    }

    val denseIds = (0L until n.toLong)
    val denseBmp = denseIds.map(id => id -> Multimodal.syntheticBmp(id)).toMap
    report("image dense", denseIds,
      id => PerceptualHash.dhash64(denseBmp(id)),
      id => PerceptualHash.ahash64(denseBmp(id)))

    val sparseBmp = denseIds.map(id => id -> Multimodal.syntheticBmpSparse(id)).toMap
    report("image sparse", denseIds,
      id => PerceptualHash.dhash64(sparseBmp(id)),
      id => PerceptualHash.ahash64(sparseBmp(id)))

    // JPEG twins: pair (id, id+M) where id+M is the JPEG re-encode;
    // measure the twin distances directly (these are the pairs the
    // r9 discipline pins within a small radius of h64)
    def jpegOf(id: Long): Array[Byte] = {
      val up = Multimodal.resizeBmpBytes(Multimodal.syntheticBmp(id), 72, 64).get
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(up))
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.75f)
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      w.dispose(); ios.close()
      out.toByteArray
    }
    val jIds = (0L until 300L)
    var jMaxD = -1; var jMaxC = -1; var jMax128 = -1
    val jHist = scala.collection.mutable.Map[Int, Int]()
    jIds.foreach { id =>
      val bmp = denseBmp(id); val jpg = jpegOf(id)
      val d = java.lang.Long.bitCount(
        PerceptualHash.dhash64(bmp) ^ PerceptualHash.hash64(jpg, true))
      val c = java.lang.Long.bitCount(
        PerceptualHash.ahash64(bmp) ^ PerceptualHash.hash64(jpg, false))
      jHist(d + c) = jHist.getOrElse(d + c, 0) + 1
      if (d > jMaxD) jMaxD = d
      if (c > jMaxC) jMaxC = c
      if (d + c > jMax128) jMax128 = d + c
    }
    println(s"== jpeg twins: n=${jIds.size} maxD=$jMaxD maxA=$jMaxC max128=$jMax128")
    println(s"   h128 histogram:      " +
      jHist.toSeq.sortBy(_._1).map { case (k, v) => s"$k:$v" }.mkString(" "))

    val denseWav = denseIds.map(id => id -> Multimodal.syntheticPcmWav(id)).toMap
    report("audio dense avg", denseIds,
      id => AudioFingerprint.fp64(denseWav(id)),
      id => fpAvg64(denseWav(id)))
    report("audio dense vert", denseIds,
      id => AudioFingerprint.fp64(denseWav(id)),
      id => fpVert64(denseWav(id)))

    val sparseWav = denseIds.map(id =>
      id -> Multimodal.syntheticPcmWavSparse(id)).toMap
    report("audio sparse avg", denseIds,
      id => AudioFingerprint.fp64(sparseWav(id)),
      id => fpAvg64(sparseWav(id)))
    report("audio sparse vert", denseIds,
      id => AudioFingerprint.fp64(sparseWav(id)),
      id => fpVert64(sparseWav(id)))

    // the DOUBLED-GRID audio fingerprint: 17×8 energy grid → 128
    // gradient bits natively (16 comparisons per row × 8 rows).
    // Ground truth here is FAMILY membership (the fixture's
    // construction), not the 64-bit pair set: report the same-family
    // wide-distance distribution and the closest cross-family pair.
    def wideGrid(b: Array[Byte]): (Long, Long) = {
      val h = AudioFingerprint.fpWide(b)   // the SHIPPED kernel
      (h(0), h(1))
    }
    def famReport(name: String, wavs: Map[Long, Array[Byte]],
                  fam: Long => Long): Unit = {
      val w = wavs.map { case (id, b) => id -> wideGrid(b) }
      val hist = scala.collection.mutable.Map[Int, Int]()
      var maxSame = -1; var minCross = Int.MaxValue
      for (a <- wavs.keys.toSeq.sorted; b <- wavs.keys.toSeq.sorted if a < b) {
        val d = java.lang.Long.bitCount(w(a)._1 ^ w(b)._1) +
          java.lang.Long.bitCount(w(a)._2 ^ w(b)._2)
        if (fam(a) == fam(b)) {
          hist(d) = hist.getOrElse(d, 0) + 1
          if (d > maxSame) maxSame = d
        } else if (d < minCross) minCross = d
      }
      println(s"== $name (17x8 grid, family truth)")
      println(s"   same-family dist:    " +
        hist.toSeq.sortBy(_._1).map { case (k, v) => s"$k:$v" }.mkString(" "))
      println(s"   maxSameFam=$maxSame minCrossFam=$minCross")
    }
    famReport("audio dense wide", denseWav, _ / 100L)
    // sparse: only phase-2 blocks are partnered; others are singletons
    famReport("audio sparse wide",
      sparseWav.filter { case (id, _) =>
        Math.floorMod(id / 100L, 4L) == Multimodal.SparseAudioPhase },
      _ / 100L)
  }
}
