package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.{Dedup, Quality, TextStats}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev decomposition of the q98 SERVICE arrival cost (the round-10
  * `weak`): which leg of [[graft.llm.Admission.auditWithFps]] carries
  * the O(corpus) term — the fingerprint membership join, the band-index
  * hot-bucket restriction, or the seen-text candidate restriction?
  * Times each sub-plan in isolation against PERSISTED stores (the
  * service shape), noop-forced, so the store-layout fix targets the
  * measured term instead of the guessed one. */
object ProbeQ98Legs {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mod = sys.env.getOrElse("SPARK_GRAFT_BATCH_MOD", "10").toLong
    val s = Sessions.build("probe-q98legs")
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-32s $sec%8.2f s"); sec
    }
    val d = Tables.documents(s, dir)
    val isBatch = pmod(xxhash64(col("doc_id")), lit(mod)) === 7
    val batch = d.where(isBatch).select(col("doc_id"), col("text"))
    val corpus = d.where(!isBatch)
    println(s"corpus=${corpus.count()} batch=${batch.count()} dir=$dir")

    val root = java.nio.file.Files.createTempDirectory("graft_q98legs")
    try {
      t("seed: seen") {
        corpus.select(col("doc_id"), col("text"))
          .write.parquet(s"$root/seen/mb_init")
      }
      t("seed: index") {
        Dedup.minhashBandIndex(corpus, "doc_id", "text")
          .write.parquet(s"$root/index/mb_init")
      }
      t("seed: fps") {
        corpus.select(TextStats.fingerprint(col("text")).as("fp"))
          .write.parquet(s"$root/fps/mb_init")
      }
      val seen = s.read.parquet(s"$root/seen/mb_init")
      val index = s.read.parquet(s"$root/index/mb_init")
      val fps = s.read.parquet(s"$root/fps/mb_init")

      t("gate (batch-sized)") {
        noop(Quality.scored(batch, "text"))
      }
      // exact-dup, current form: store.distinct() then batch LEFT JOIN
      val gated = batch.select(col("doc_id"), col("text"))
      t("exact: distinct+left join") {
        val store = fps.select(col("fp")).distinct()
        val wFp = Window.partitionBy(col("fp"))
        noop(gated
          .withColumn("fp", TextStats.fingerprint(col("text")))
          .join(store.withColumn("__in_seen", lit(true)), Seq("fp"), "left")
          .withColumn("exact_dup",
            coalesce(col("__in_seen"), lit(false)) ||
              col("doc_id") > min(col("doc_id")).over(wFp)))
      }
      // exact-dup, semi form: store semi-joined against broadcast batch
      t("exact: semi+broadcast back") {
        val batchFps = gated
          .withColumn("fp", TextStats.fingerprint(col("text")))
        val hits = fps.select(col("fp"))
          .join(broadcast(batchFps.select(col("fp"))), Seq("fp"), "left_semi")
          .distinct()
        val wFp = Window.partitionBy(col("fp"))
        noop(batchFps
          .join(broadcast(hits.withColumn("__in_seen", lit(true))),
            Seq("fp"), "left")
          .withColumn("exact_dup",
            coalesce(col("__in_seen"), lit(false)) ||
              col("doc_id") > min(col("doc_id")).over(wFp)))
      }
      // the probe as registered
      t("probe (full)") {
        noop(Dedup.minhashProbePairs(seen, batch, "doc_id", "text",
          index, 0.8))
      }
      // probe sub-leg: index scan + hot semi-join + bucket agg only
      // PRE-round-11 shape (regression sentinel): the unhinted hot
      // semi-join — the planner sees no stats on `hot` and
      // sort-merges, shuffling the corpus-sized index
      t("index restrict: SMJ (old)") {
        val newSh = batch.select(col("doc_id").cast("long").as("id"),
          graft.llm.Dedup.shingles(col("text"), 2).as("sh"))
        val newBanded = Dedup.bandedSignatures(newSh, 16, 4)
        val hot = newBanded.select(col("band"), col("band_hash")).distinct()
        noop(index
          .select(col("id").cast("long").as("id"), col("band"),
            col("band_hash"))
          .join(hot, Seq("band", "band_hash"), "left_semi")
          .groupBy(col("band"), col("band_hash"))
          .agg(count(lit(1)).as("n")))
      }
      // the round-11 operator shape: broadcast hot set, index streamed
      t("index restrict: broadcast") {
        val newSh = batch.select(col("doc_id").cast("long").as("id"),
          graft.llm.Dedup.shingles(col("text"), 2).as("sh"))
        val newBanded = Dedup.bandedSignatures(newSh, 16, 4)
        val hot = broadcast(
          newBanded.select(col("band"), col("band_hash")).distinct())
        noop(index
          .select(col("id").cast("long").as("id"), col("band"),
            col("band_hash"))
          .join(hot, Seq("band", "band_hash"), "left_semi")
          .groupBy(col("band"), col("band_hash"))
          .agg(count(lit(1)).as("n")))
      }
      // probe sub-leg: banding the batch alone
      t("probe: batch banding") {
        val newSh = batch.select(col("doc_id").cast("long").as("id"),
          graft.llm.Dedup.shingles(col("text"), 2).as("sh"))
        noop(Dedup.bandedSignatures(newSh, 16, 4))
      }
      val someIds = seen.select(col("doc_id").cast("long").as("id"))
        .limit(100)
      // PRE-round-11 shape (regression sentinel): shingles projected
      // above the semi-join — Catalyst does not push a semi-join under
      // an expensive projection, so this shingles ALL corpus texts to
      // keep 100 docs
      t("text restrict: shingle-first (old)") {
        noop(seen
          .select(col("doc_id").cast("long").as("id"),
            graft.llm.Dedup.shingles(col("text"), 2).as("sh"))
          .join(broadcast(someIds), Seq("id"), "left_semi"))
      }
      // the round-11 operator shape: restrict raw rows, then shingle
      t("text restrict: join-first") {
        noop(seen
          .join(broadcast(someIds.select(col("id").as("__cid"))),
            col("doc_id").cast("long") === col("__cid"), "left_semi")
          .select(col("doc_id").cast("long").as("id"),
            graft.llm.Dedup.shingles(col("text"), 2).as("sh")))
      }
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
