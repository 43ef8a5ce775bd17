package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.{Admission, Dedup, Multimodal, TextStats}
import org.apache.spark.sql.functions._

/** Dev probe backing the q103 N-ARRIVAL SCALE.md rows (round-13
  * verdict directive #4): ProbeQ98Seq's hundreds-of-arrivals regime at
  * the MULTIMODAL service — N sequential
  * [[graft.llm.Admission.processMultimodalMicroBatch]] arrivals
  * against the same growing FIVE mb_ stores (seen docs, band index,
  * text fp, image fp, audio fp), with periodic [[Admission
  * .compactStore]] maintenance over ALL FIVE roots (safeBelow = the
  * next arrival id, the documented replay watermark) — does the
  * per-arrival cost stay flat through a long service life, and what
  * do the two extra media-store compactions cost? The bit-identical
  * with-and-without-compaction audit pin for this path lives in
  * StreamingSpec (the q98 pin's multimodal twin).
  *
  * Media payloads are the synthetic BMP/WAV tables attached by id
  * join BEFORE each batch lands (a real service's batch arrives with
  * payloads inline); `SPARK_GRAFT_SPARSE=1` switches to the SPARSE
  * discriminating fixtures (q104's — a known ~25% minority per
  * modality has near partners, modalities disagree), so admission
  * selectivity in the sweep is realistic rather than all-flagged.
  *
  * Batches are disjoint hash-mod slices (ids disjoint but NOT
  * monotone — fine for timing; the monotone-id equality contract is
  * pinned in StreamingSpec). */
object ProbeQ103Seq {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata-sf100docs")
    val mod = sys.env.getOrElse("SPARK_GRAFT_BATCH_MOD", "10000").toLong
    val n = sys.env.getOrElse("SPARK_GRAFT_ARRIVALS", "50").toInt
    val compactEvery = sys.env.get("SPARK_GRAFT_COMPACT_EVERY").map(_.toInt)
    val sparse = sys.env.get("SPARK_GRAFT_SPARSE").contains("1")
    val s = Sessions.build("probe-q103seq")
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-24s $sec%8.2f s"); sec
    }
    require(n < mod - 1, s"need $n disjoint slices out of $mod")
    val d = Tables.documents(s, dir)
    def withMedia(df: org.apache.spark.sql.DataFrame) = {
      val base = df.select(col("doc_id"))
      val imgs = (if (sparse) Multimodal.syntheticImageTableSparse(base, "doc_id")
                  else Multimodal.syntheticImageTable(base, "doc_id"))
        .select(col("media_id").as("__iid"), col("payload").as("img"))
      val wavs = (if (sparse) Multimodal.syntheticAudioTableSparse(base, "doc_id")
                  else Multimodal.syntheticAudioTable(base, "doc_id"))
        .select(col("media_id").as("__aid"), col("payload").as("wav"))
      df.join(imgs, col("doc_id") === col("__iid")).drop("__iid")
        .join(wavs, col("doc_id") === col("__aid")).drop("__aid")
    }
    val slice = pmod(xxhash64(col("doc_id")), lit(mod))
    val corpus = withMedia(d.select(col("doc_id"), col("text"))
      .where(slice >= n))

    val root = java.nio.file.Files.createTempDirectory("graft_q103seq")
    val (seen, index, fps, imgFp, audFp, audit) =
      (s"$root/seen", s"$root/index", s"$root/fps",
        s"$root/imgfp", s"$root/audfp", s"$root/audit")
    try {
      println(s"corpus=${corpus.count()} arrivals=$n sparse=$sparse dir=$dir")
      t("land arrival batches") {
        withMedia(d.select(col("doc_id"), col("text"), slice.as("__slice"))
            .where(slice < n))
          .write.partitionBy("__slice").parquet(s"$root/arriving")
      }
      t("seed text stores") {
        corpus.select(col("doc_id"), col("text"))
          .write.parquet(s"$seen/mb_init")
        Dedup.minhashBandIndex(corpus, "doc_id", "text")
          .write.parquet(s"$index/mb_init")
        corpus.select(TextStats.fingerprint(col("text")).as("fp"))
          .write.parquet(s"$fps/mb_init")
      }
      t("seed media fp stores") {
        corpus.select(col("doc_id").cast("long").as("id"),
            graft.functions.PerceptualHash.d_hash(col("img")).as("sh"))
          .where(col("sh").isNotNull)
          .write.parquet(s"$imgFp/mb_init")
        corpus.select(col("doc_id").cast("long").as("id"),
            graft.functions.AudioFingerprint.audio_fp(col("wav")).as("sh"))
          .where(col("sh").isNotNull)
          .write.parquet(s"$audFp/mb_init")
      }
      val times = (0 until n).map { k =>
        if (compactEvery.exists(e => k > 0 && k % e == 0)) {
          t(s"compact 5 stores @$k") {
            Seq(seen, index, fps, imgFp, audFp)
              .foreach(Admission.compactStore(s, _, k))
          }
        }
        val batch = s.read.parquet(s"$root/arriving/__slice=$k")
        t(f"arrival $k%02d (${batch.count()}%d docs)") {
          Admission.processMultimodalMicroBatch(batch, k.toLong, "doc_id",
            "text", "img", "wav", seen, index, fps, imgFp, audFp, audit)
        }
      }
      val firstFive = times.take(5).sum / 5
      val lastFive = times.takeRight(5).sum / 5
      println(f"mean first5=$firstFive%.2f s last5=$lastFive%.2f s " +
        f"drift=${lastFive / firstFive}%.2fx")
      val a = s.read.option("recursiveFileLookup", "true").parquet(audit)
      println(s"audit rows total: ${a.count()}, admitted: " +
        s"${a.where(col("admitted")).count()}, image_dup: " +
        s"${a.where(col("image_dup")).count()}, audio_dup: " +
        s"${a.where(col("audio_dup")).count()}")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
    s.stop()
  }
}
