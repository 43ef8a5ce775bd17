package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.{Admission, Dedup, Multimodal, TextStats}
import org.apache.spark.sql.functions._

/** Dev probe backing the MULTIMODAL admission-service SCALE.md rows —
  * ProbeQ98Svc with the two media legs: what does ONE arrival of a
  * ~fixed-size batch cost through
  * [[graft.llm.Admission.processMultimodalMicroBatch]] (five persisted
  * stores read, audit written, six appends) as the frozen corpus grows
  * a decade per run? Media payloads are the q80/q84 synthetic BMP/WAV
  * tables, attached by id join BEFORE the timed arrival (a real
  * service's batch arrives with payloads inline); the media
  * fingerprint stores are seeded from the corpus payloads — hashed
  * once per corpus life, the artifact the service exists to persist.
  *
  * Batch held ~500 docs by hash-modulo selection (MOD scaled per
  * decade like ProbeQ95/ProbeQ98Svc). */
object ProbeQ103Svc {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mod = sys.env.getOrElse("SPARK_GRAFT_BATCH_MOD", "10").toLong
    val s = Sessions.build("probe-q103svc")
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-24s $sec%8.2f s"); sec
    }
    val d = Tables.documents(s, dir)
    def withMedia(df: org.apache.spark.sql.DataFrame) = {
      val imgs = Multimodal.syntheticImageTable(df.select(col("doc_id")), "doc_id")
        .select(col("media_id").as("__iid"), col("payload").as("img"))
      val wavs = Multimodal.syntheticAudioTable(df.select(col("doc_id")), "doc_id")
        .select(col("media_id").as("__aid"), col("payload").as("wav"))
      df.select(col("doc_id"), col("text"))
        .join(imgs, col("doc_id") === col("__iid")).drop("__iid")
        .join(wavs, col("doc_id") === col("__aid")).drop("__aid")
    }
    val isBatch = pmod(xxhash64(col("doc_id")), lit(mod)) === 7
    val corpus = withMedia(d.where(!isBatch))

    val root = java.nio.file.Files.createTempDirectory("graft_q103svc")
    val (seen, index, fps, imgFp, audFp, audit) =
      (s"$root/seen", s"$root/index", s"$root/fps",
        s"$root/imgfp", s"$root/audfp", s"$root/audit")
    try {
      withMedia(d.where(isBatch))
        .write.mode("overwrite").parquet(s"$root/arriving")
      val batch = s.read.parquet(s"$root/arriving")
      println(s"corpus=${corpus.count()} batch=${batch.count()} dir=$dir")
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
      t("one arrival (service)") {
        Admission.processMultimodalMicroBatch(batch, 0L, "doc_id",
          "text", "img", "wav", seen, index, fps, imgFp, audFp, audit)
      }
      val n = s.read.option("recursiveFileLookup", "true").parquet(audit)
      println(s"audit rows: ${n.count()}, admitted: " +
        s"${n.where(col("admitted")).count()}, media-flagged: " +
        s"${n.where(col("image_dup") || col("audio_dup")).count()}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    s.stop()
  }
}
