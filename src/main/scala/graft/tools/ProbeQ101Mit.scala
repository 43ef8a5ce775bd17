package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.{Dedup, Multimodal}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe backing the q101 PERCOLATION-MITIGATION SCALE.md row
  * (round-13 verdict directive #2): the 5M-doc composed freeze
  * measured 2228.8 s with CC diameter-bound at 262 s because the
  * fixture's collision graph percolates at Hamming ≤ 7 (widest
  * component 3.0M of 5M — rare cross-family collisions chain the 50k
  * width-100 families; measured min cross-family dHash distance is
  * 6-9, mean ~23). The round-13 analysis NAMED the production
  * mitigations (tighter threshold, capped banding) but ran neither on
  * the percolating fixture. This probe turns that paragraph into a
  * measurement, on the dominant (image) leg:
  *
  *  - `baseline_h7`: maxHamming=7, cap off — the percolating shape,
  *    re-measured side-by-side (pairs, cross-family bridge pairs, CC
  *    wall, component-width distribution).
  *  - `capped_h7`: maxHamming=7, maxBucketSize=20 — the cap bounds
  *    per-bucket pair volume (width-100 family buckets emit C(20,2)
  *    not C(100,2); loud sentinels witness every capped bucket).
  *    MEASURED effect on percolation at 5M: bridges collapse too
  *    (8.15M → 928) because cross-family collisions materialize
  *    inside MIXED over-cap buckets (two families sharing clean key
  *    blocks land in one ~200-member bucket, and the 20 kept lowest
  *    ids are usually one family's) — but that same truncation
  *    fragments legitimate family cliques (widest component 64, mean
  *    2.8 vs the true width 100), i.e. the cap is a declared-recall
  *    volume guard, not a semantics-preserving percolation fix.
  *  - `tight_h3`: maxHamming=3, cap off, identical geometry (blocks=9,
  *    keyBlocks=2 — pigeonhole needs keyBlocks ≤ blocks−maxHamming, so
  *    the 36-combo key expansion is unchanged and the measured delta
  *    is the threshold alone) — cross-family bridges need distance ≤ 3
  *    against a measured minimum of 6, so the graph falls back to
  *    bounded family cliques and CC is shallow again.
  *
  * Then the COMPOSED three-modality freeze (q101's exact plan shape)
  * re-runs with maxHamming=3 on both media legs, for the side-by-side
  * against the 2228.8 s uncapped row. Noop forcing throughout. */
object ProbeQ101Mit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata-sf100docs")
    val s = Sessions.build("probe-q101mit")
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-28s $sec%8.2f s"); sec
    }
    val d = Tables.documents(s, dir)
    println(s"docs=${d.count()} dir=$dir")
    val imgs = Multimodal.syntheticImageTable(d.select(col("doc_id")),
      "doc_id")

    // args select legs by name (default: all four + the composed run)
    def want(name: String): Boolean = args.isEmpty || args.contains(name)

    def leg(name: String, maxHamming: Int, cap: Int,
            runCc: Boolean, blocks: Int = 9, keyBlocks: Int = 2): Unit = {
      if (!want(name)) return
      var out: DataFrame = null
      t(s"$name pairs gen") {
        out = graft.core.Caching.eager(Multimodal.imageNearDupPairs(
          imgs, "media_id", "payload", blocks = blocks,
          maxHamming = maxHamming, keyBlocks = keyBlocks,
          maxBucketSize = cap))
      }
      val acct = out.agg(
        sum(when(col("id_a") >= 0, 1L).otherwise(0L)).as("pairs"),
        sum(when(col("id_a") < 0, 1L).otherwise(0L)).as("sentinels"),
        sum(when(col("id_a") >= 0 &&
          expr("id_a DIV 100") =!= expr("id_b DIV 100"), 1L).otherwise(0L))
          .as("bridges")).collect()(0)
      println(s"$name pairs=${acct.getLong(0)} sentinels=${acct.getLong(1)} " +
        s"cross_family_bridges=${acct.getLong(2)}")
      if (runCc) {
        val edges = out.where(col("id_a") >= 0)
          .select(col("id_a").as("src"), col("id_b").as("dst"))
        var cc: DataFrame = null
        t(s"$name CC") {
          cc = graft.core.Caching.eager(Dedup.connectedComponents(edges))
        }
        val stats = cc.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("components"), max(col("n")).as("widest"),
            avg(col("n")).as("mean_width")).collect()(0)
        println(s"$name components=${stats.getLong(0)} " +
          s"widest=${stats.getLong(1)} " +
          f"mean=${stats.getDouble(2)}%.1f")
        cc.unpersist()
      }
      out.unpersist()
    }

    leg("baseline_h7", maxHamming = 7, cap = 0, runCc = true)
    leg("capped_h7_cap20", maxHamming = 7, cap = 20, runCc = true)
    leg("tight_h3", maxHamming = 3, cap = 0, runCc = true)
    // the threshold mitigation COMPOSES with a geometry retune: h≤3
    // needs only 1 clean block of 4 by pigeonhole, so blocks=4 /
    // keyBlocks=1 is still exhaustive and cuts the map-side key
    // expansion from C(9,2)=36 combos to 4 — attacking the pair-gen
    // term the composed freeze is actually bound by
    leg("tight_h3_b4k1", maxHamming = 3, cap = 0, runCc = true,
      blocks = 4, keyBlocks = 1)

    // the composed three-modality freeze, q101's exact plan shape,
    // with the tight threshold on both media legs — the side-by-side
    // for SCALE.md's 2228.8 s uncapped row
    // composed freeze variants: "composed" = h≤3 media at the default
    // 9/2 geometry; "composed_b4k1" = h≤3 at the retuned 4/1 geometry
    // (exhaustive for h≤3, 4 probe keys instead of 36);
    // "composed_auto" = h≤3 passing NO geometry, exercising the r15
    // autoGeometry default (resolves to 4/1 — the productized form of
    // the retune). Each variant runs independently when its name is
    // selected (all on empty args); passing several names runs each,
    // sequentially. SPARK_GRAFT_SPARSE=1 switches the media legs to
    // the SPARSE discriminating fixtures — q105's composed shape —
    // for the sparse-twin wall row.
    val sparse = sys.env.get("SPARK_GRAFT_SPARSE").contains("1")
    def imgTable(df: DataFrame) =
      if (sparse) Multimodal.syntheticImageTableSparse(df, "doc_id")
      else Multimodal.syntheticImageTable(df, "doc_id")
    def audTable(df: DataFrame) =
      if (sparse) Multimodal.syntheticAudioTableSparse(df, "doc_id")
      else Multimodal.syntheticAudioTable(df, "doc_id")
    def droppedIds(edges: DataFrame, as: String): DataFrame =
      Dedup.connectedComponents(edges)
        .where(col("id") =!= col("cluster_id"))
        .select(col("id").as(as))
    def composedFreeze(cB: Int, cK: Int): Unit =
      t(s"composed freeze h3 media " +
        (if (cB == 0) "auto" else s"b${cB}k$cK") +
        (if (sparse) " sparse" else "")) {
      val textDrop = droppedIds(
        Dedup.minhashNearDupPairs(d, "doc_id", "text",
            threshold = 0.8, shingleN = 2, bands = 16, rows = 4)
          .select(col("id_a").as("src"), col("id_b").as("dst")), "__tid")
      val imgDrop = droppedIds(
        Multimodal.imageNearDupPairs(
            imgTable(d.select(col("doc_id"))), "media_id", "payload",
            blocks = cB, maxHamming = 3, keyBlocks = cK)
          .select(col("id_a").as("src"), col("id_b").as("dst")), "__iid")
      val audDrop = droppedIds(
        Multimodal.audioNearDupPairs(
            audTable(d.select(col("doc_id"))), "media_id", "payload",
            blocks = cB, maxHamming = 3, keyBlocks = cK)
          .select(col("id_a").as("src"), col("id_b").as("dst")), "__aid")
      noop(d.join(textDrop, col("doc_id") === col("__tid"), "left")
        .join(imgDrop, col("doc_id") === col("__iid"), "left")
        .join(audDrop, col("doc_id") === col("__aid"), "left")
        .withColumn("__t", col("__tid").isNotNull)
        .withColumn("__i", col("__iid").isNotNull)
        .withColumn("__a", col("__aid").isNotNull)
        .withColumn("__adm", !col("__t") && !col("__i") && !col("__a"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__t").cast("long")).as("text_dropped"),
          sum(col("__i").cast("long")).as("image_dropped"),
          sum(col("__a").cast("long")).as("audio_dropped"),
          sum(col("__adm").cast("long")).as("admitted"),
          sum(when(col("__adm"), col("doc_id")).otherwise(lit(0L)))
            .cast("long").as("admitted_id_sum"),
          sum(when(col("__adm"), col("n_chars")).otherwise(lit(0L)))
            .cast("long").as("admitted_chars"))
        .orderBy(col("source")))
    }
    if (want("composed")) composedFreeze(9, 2)
    if (want("composed_b4k1")) composedFreeze(4, 1)
    // on empty args skip the auto variant when it resolves to a
    // geometry already measured this invocation (auto(h=3) = (4,1)
    // duplicates composed_b4k1 — the r15 advice note); naming
    // "composed_auto" explicitly still runs it
    val autoGeom = Dedup.autoGeometry(3)
    val autoAlreadyRun =
      (want("composed") && autoGeom == ((9, 2))) ||
        (want("composed_b4k1") && autoGeom == ((4, 1)))
    if (args.contains("composed_auto") ||
        (args.isEmpty && !autoAlreadyRun)) composedFreeze(0, 0)
    s.stop()
  }
}
