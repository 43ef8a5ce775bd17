package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Dev probe backing the SCALE.md r15 GEOMETRY DISPATCH TABLE — the
  * measurement behind [[graft.llm.Dedup.autoGeometry]]'s key-width
  * floor (round-14 verdict directive #1: "measure the h<=3 AND h<=7
  * dispatch table ... 8/1 vs 9/2 at h<=7 trades 36→8 combos against
  * 8-bit key-block bucket width; don't assume the narrow form wins").
  *
  * Times PAIR GENERATION ONLY on the synthetic image fixture's dHash
  * fingerprints: the fingerprint pass runs once, eager-cached and
  * materialized BEFORE any leg starts, so every leg's wall is the
  * banding join alone. Legs (selected by name in args, all by
  * default):
  *
  *  - `h3_b9k2` / `h3_b4k1`: the r14 pair at maxHamming=3 — wide
  *    36-combo geometry vs the narrow 4-key form autoGeometry now
  *    picks (measured 506.2 vs 26.1 s at 5M in r14).
  *  - `h7_b9k2` / `h7_b8k1`: maxHamming=7 — the shipped default vs
  *    the NARROWEST exhaustive form. 8/1's key space is floor(64/8)=8
  *    bits = 256 buckets per combination, so bucket occupancy grows
  *    linearly in n and the join output quadratically: run this leg
  *    across decades (50k → 500k) to trace the curve; at 5M its
  *    projected join volume is ~C(5M/256, 2)·256·8 ≈ 4·10^11 rows —
  *    run it there only if you mean to.
  *
  * Pair counts print per leg: geometries at the same threshold must
  * agree exactly (exhaustive by pigeonhole; spec-pinned in
  * MultimodalSpec), so any count divergence is a bug, not tuning. */
object ProbeGeom {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata-sf1")
    val s = Sessions.build("probe-geom")
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-16s $sec%8.2f s"); sec
    }
    val d = Tables.documents(s, dir)
    println(s"docs=${d.count()} dir=$dir")
    val fp = graft.core.Caching.eager(
      graft.llm.Multimodal.syntheticImageTable(
          d.select(col("doc_id")), "doc_id")
        .select(col("media_id").as("id"),
          graft.functions.PerceptualHash.d_hash(col("payload")).as("sh"))
        .where(col("sh").isNotNull))
    t("fingerprint") { fp.count(): Unit }

    def want(name: String): Boolean = args.isEmpty || args.contains(name)
    def leg(name: String, maxHamming: Int, blocks: Int,
            keyBlocks: Int): Unit = {
      if (!want(name)) return
      var pairs = -1L
      t(name) {
        pairs = Dedup.hammingCandidatesFromFp(fp, blocks, maxHamming,
          keyBlocks).count()
      }
      println(s"$name pairs=$pairs")
    }
    leg("h3_b9k2", 3, 9, 2)
    leg("h3_b4k1", 3, 4, 1)
    leg("h7_b9k2", 7, 9, 2)
    leg("h7_b8k1", 7, 8, 1)
    // tie-break probes: both alternatives SATISFY the 14-bit floor but
    // carry more combination keys than the auto pick — each extra
    // clean combination is one more duplicate emission of every
    // near-dup pair into the canonical filter, so "fewest combos
    // subject to the floor" should win even against wider keys
    leg("h3_b5k2", 3, 5, 2) // C(5,2)=10 combos of 24 bits vs auto 4/1
    leg("h7_b10k3", 7, 10, 3) // C(10,3)=120 of 18 bits vs auto 9/2
    // r16 n-aware-floor candidates: the geometries a raised key-bit
    // floor would pick at h<=7 once the 10^6-10^7 decade fills 9/2's
    // ~15-bit key space (the measured q80/q84 sf10 superlinearity).
    // More combos multiply every TRUE pair's join emissions (a pair
    // with d dirty blocks collides in C(blocks-d, keyBlocks) combos),
    // while wider keys cut RANDOM bucket collisions — which term wins
    // is a property of the corpus' near-dup density, so measure both
    // decades, don't model
    leg("h7_b11k4", 7, 11, 4) // C(11,4)=330 of 20 bits
    leg("h7_b12k5", 7, 12, 5) // C(12,5)=792 of 25 bits
    s.stop()
  }
}
