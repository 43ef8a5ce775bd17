package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Sessions

/** Dev probe (r17): where does q106/q107's sf0.1 wall time go?
  * Times, separately: the wide fingerprint build, the 64-bit pair-gen
  * (q80 baseline), the 128-bit pair-gen on prebuilt fps, and a
  * canonical-combo variant computed through a 2^blocks lookup table
  * instead of the C(blocks,kb)-deep nested CASE chain.
  * Usage: runMain graft.tools.ProbeWideTime [sfDir]
  */
object ProbeWideTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("probe-wide-time")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"))
    def timed[T](label: String)(body: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val media = graft.llm.Multimodal.syntheticImageTable(docs, "doc_id")
    // (a) the wide fingerprint build alone (the eager-cache job)
    val fpPlan = media.select(
        col("media_id").cast("long").as("id"),
        graft.functions.PerceptualHash.d_a_hash(col("payload")).as("h"))
      .where(col("h").isNotNull)
      .select(col("id"), col("h.dh").as("lo"), col("h.ah").as("hi"))
    (1 to 2).foreach { i =>
      timed(s"fp128 build (run $i)")(force(fpPlan))
    }
    val fp = timed("fp128 eager cache")(graft.core.Caching.eager(fpPlan))

    // (b) 128-bit pair-gen on the prebuilt cache (current shape)
    (1 to 2).foreach { i =>
      timed(s"pairs128 current (run $i)") {
        force(graft.llm.Dedup.hammingCandidatesFromFp128(fp, 0, 8, 0))
      }
    }

    // (c) 64-bit baseline on the same ids (q80's shape) for scale
    val fp64 = timed("fp64 eager cache") {
      graft.core.Caching.eager(media.select(
          col("media_id").cast("long").as("id"),
          graft.functions.PerceptualHash.d_hash(col("payload")).as("sh"))
        .where(col("sh").isNotNull))
    }
    (1 to 2).foreach { i =>
      timed(s"pairs64 current (run $i)") {
        force(graft.llm.Dedup.hammingCandidatesFromFp(fp64, 0, 7, 0))
      }
    }

    // (d) 128-bit pair-gen with canonical computed via a clean-block
    // bitmask + 2^blocks lookup table instead of the nested CASE chain
    def pairs128Lookup(fpIn: DataFrame, blocks: Int, maxHamming: Int,
                       keyBlocks: Int): DataFrame = {
      val combos = (0 until blocks).combinations(keyBlocks).toSeq
      val comboKeys = graft.llm.Dedup.comboKeyExprs128(
        col("lo"), col("hi"), blocks, keyBlocks)
      val keyed = fpIn.select(col("id"), col("lo"), col("hi"),
        posexplode(array(comboKeys: _*)).as(Seq("combo", "key")))
      val (widths, offsets) = graft.llm.Dedup.blockLayout128(blocks)
      def rangeMask(start: Int, end: Int): Long =
        if (start >= end) 0L
        else if (end - start == 64) -1L
        else ((1L << (end - start)) - 1) << start
      val blockMasks = (0 until blocks).map { b =>
        (rangeMask(offsets(b), math.min(offsets(b) + widths(b), 64)),
         rangeMask(math.max(offsets(b), 64) - 64,
           offsets(b) + widths(b) - 64))
      }
      val xorLo = col("a.lo").bitwiseXOR(col("b.lo"))
      val xorHi = col("a.hi").bitwiseXOR(col("b.hi"))
      val ham = (bit_count(xorLo) + bit_count(xorHi)).cast("int")
      // clean-block bitmask: bit b set iff block b's xor slice is 0
      val cleanBits = blockMasks.zipWithIndex.map { case ((ml, mh), b) =>
        when(xorLo.bitwiseAND(lit(ml)) === 0L &&
          xorHi.bitwiseAND(lit(mh)) === 0L, lit(1 << b)).otherwise(lit(0))
      }.reduce(_ + _)
      // canonical[mask] = first combo whose blocks are all clean in mask
      val comboBits = combos.map(_.map(1 << _).sum)
      val table = Array.tabulate(1 << blocks) { m =>
        val i = comboBits.indexWhere(cb => (m & cb) == cb)
        i // -1 when none
      }
      val canonical = element_at(typedLit(table.toSeq), cleanBits + 1)
      keyed.as("a").join(broadcast(keyed.as("b")),
          col("a.combo") === col("b.combo") &&
          col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
        .where(ham <= maxHamming && col("a.combo") === canonical)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          ham.as("hamming"))
    }
    (1 to 2).foreach { i =>
      timed(s"pairs128 lookup (run $i)") {
        force(pairs128Lookup(fp, 10, 8, 2))
      }
    }
    // sanity: identical pair sets
    timed("equality check") {
      val cur = graft.llm.Dedup.hammingCandidatesFromFp128(fp, 0, 8, 0)
      val alt = pairs128Lookup(fp, 10, 8, 2)
      val d1 = cur.exceptAll(alt).count()
      val d2 = alt.exceptAll(cur).count()
      println(s"[probe] exceptAll cur-alt=$d1 alt-cur=$d2")
    }
    spark.stop()
  }
}
