package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.{Admission, Dedup, TextStats}
import org.apache.spark.sql.functions._

/** Dev probe backing the q98 N-ARRIVAL SCALE.md rows: ProbeQ98Svc
  * measures ONE arrival per corpus size; this one drives N sequential
  * [[graft.llm.Admission.processMicroBatch]] arrivals against the SAME
  * growing mb_ stores and prints every per-arrival time — the
  * small-file-accumulation question (each arrival appends its own
  * mb_<id> subdir, so arrival k reads k-1+seed subdirs; does listing +
  * footer overhead drift the per-arrival cost?). Optionally compacts
  * the stores midway (SPARK_GRAFT_COMPACT_AT=k) or PERIODICALLY
  * (SPARK_GRAFT_COMPACT_EVERY=k, the long-running service's
  * maintenance cadence — safeBelow = the next arrival id, the
  * documented replay-safety watermark) to measure what compaction
  * buys across a hundreds-of-arrivals regime.
  *
  * Batches are disjoint hash-mod slices of the fixture, each written to
  * its own parquet BEFORE its timed arrival (the real service's batch
  * is a small source read, not a corpus-fixture filter). Ids are
  * disjoint but NOT monotone across batches — fine for timing; the
  * monotone-id equality contract is pinned in StreamingSpec. */
object ProbeQ98Seq {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf10")
    val mod = sys.env.getOrElse("SPARK_GRAFT_BATCH_MOD", "1000").toLong
    val n = sys.env.getOrElse("SPARK_GRAFT_ARRIVALS", "25").toInt
    val compactAt = sys.env.get("SPARK_GRAFT_COMPACT_AT").map(_.toInt)
    val compactEvery = sys.env.get("SPARK_GRAFT_COMPACT_EVERY").map(_.toInt)
    val s = Sessions.build("probe-q98seq")
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-24s $sec%8.2f s"); sec
    }
    require(n < mod - 1, s"need $n disjoint slices out of $mod")
    val d = Tables.documents(s, dir)
    val slice = pmod(xxhash64(col("doc_id")), lit(mod))
    val corpus = d.where(slice >= n)

    val root = java.nio.file.Files.createTempDirectory("graft_q98seq")
    val (seen, index, fps, audit) = (s"$root/seen", s"$root/index",
      s"$root/fps", s"$root/audit")
    try {
      println(s"corpus=${corpus.count()} arrivals=$n dir=$dir")
      t("land arrival batches") {
        d.where(slice < n).select(col("doc_id"), col("text"),
            slice.as("__slice"))
          .write.partitionBy("__slice").parquet(s"$root/arriving")
      }
      t("seed stores") {
        corpus.select(col("doc_id"), col("text"))
          .write.parquet(s"$seen/mb_init")
        Dedup.minhashBandIndex(corpus, "doc_id", "text")
          .write.parquet(s"$index/mb_init")
        corpus.select(TextStats.fingerprint(col("text")).as("fp"))
          .write.parquet(s"$fps/mb_init")
      }
      val times = (0 until n).map { k =>
        if (compactAt.contains(k) ||
            compactEvery.exists(e => k > 0 && k % e == 0)) {
          t(s"compact stores @$k") {
            Seq(seen, index, fps).foreach(Admission.compactStore(s, _, k))
          }
        }
        val batch = s.read.parquet(s"$root/arriving/__slice=$k")
        t(f"arrival $k%02d (${batch.count()}%d docs)") {
          Admission.processMicroBatch(batch, k.toLong, "doc_id", "text",
            seen, index, fps, audit)
        }
      }
      val firstFive = times.take(5).sum / 5
      val lastFive = times.takeRight(5).sum / 5
      println(f"mean first5=$firstFive%.2f s last5=$lastFive%.2f s " +
        f"drift=${lastFive / firstFive}%.2fx")
      val a = s.read.option("recursiveFileLookup", "true").parquet(audit)
      println(s"audit rows total: ${a.count()}, admitted: " +
        s"${a.where(col("admitted")).count()}")
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
