package graft.tools

import graft.core.Sessions
import org.apache.spark.sql.functions._

/** Dev probe: the capped Hamming banding at a REALISTIC degenerate
  * width — the regime `maxBucketSize` exists for. Fixture: one
  * width-W near-duplicate family (a boilerplate asset reused W times:
  * members within Hamming ≤ 3 of a shared base fingerprint) inside N
  * background fingerprints (xxhash64 — pairwise far). Measures
  * `hammingCandidatesFromFp` cap OFF vs ON: wall (noop-forced), pair
  * volume, sentinel count — the declared-recall-loss accounting.
  *
  * Exhaustive path cost is quadratic in W (the family is a near-clique
  * colliding in ~every combination bucket: ~W²/2 pairs × up to 36
  * combo copies through the join before the canonical filter); the
  * capped path bounds every bucket at O(cap²) pairs and announces each
  * truncation with one sentinel. */
object ProbeCap {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val width = args.drop(1).headOption.map(_.toLong).getOrElse(10000L)
    val s = Sessions.build("probe-cap")
    // family: ids [0, width) flip ≤3 deterministic low-weight bits of a
    // shared base; background: ids >= width get avalanche-spread bits
    val base = 0x5DEECE66DL
    val fp = s.range(n).select(col("id"),
      when(col("id") < width,
        lit(base)
          .bitwiseXOR(shiftleft(pmod(col("id"), lit(2)), 7))
          .bitwiseXOR(shiftleft(pmod(col("id"), lit(3)), 21))
          .bitwiseXOR(shiftleft(pmod(col("id"), lit(5) ) % 2, 42)))
      .otherwise(xxhash64(col("id"))).as("sh"))
    // caps to run (repeated for warm/timed); cap 0 = exhaustive — do
    // NOT request it at degenerate widths (w²/2 pairs by definition)
    val caps = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
               else Seq(0, 500, 0, 500)
    caps.zipWithIndex.foreach { case (cap, i) =>
      val t0 = System.nanoTime()
      graft.llm.Dedup.hammingCandidatesFromFp(fp, blocks = 9,
          maxHamming = 7, keyBlocks = 2, maxBucketSize = cap)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // counts on a second pass (never ride the timed one)
      val out = graft.llm.Dedup.hammingCandidatesFromFp(fp, blocks = 9,
        maxHamming = 7, keyBlocks = 2, maxBucketSize = cap)
      val pairs = out.where(col("id_a") >= 0).count()
      val sent = out.where(col("id_a") < 0).count()
      println(f"CAP run$i cap=$cap%4d n=$n width=$width " +
        f"wall=$wall%8.2f s pairs=$pairs sentinels=$sent")
      s.catalog.clearCache()
    }
    s.stop()
  }
}
