package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.{Admission, Dedup, TextStats}
import org.apache.spark.sql.functions._

/** Dev probe backing the admission-SERVICE SCALE.md rows: what does
  * ONE arrival of a ~fixed-size batch cost through
  * [[graft.llm.Admission.processMicroBatch]] — persisted stores read
  * (seen docs + band index + fingerprints), audit written, batch rows
  * appended — as the frozen corpus grows a decade per run? The q98
  * decade rows time the one-shot audit with everything in memory;
  * this one times the SERVICE path, parquet artifacts end to end,
  * which is where the fingerprint store earns its keep (without it
  * every arrival md5-scans the whole corpus).
  *
  * Legs: seed (amortized once per corpus life), then the per-arrival
  * step. Batch held ~500 docs by hash-modulo selection (MOD scaled
  * per decade like ProbeQ95). */
object ProbeQ98Svc {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mod = sys.env.getOrElse("SPARK_GRAFT_BATCH_MOD", "10").toLong
    val s = Sessions.build("probe-q98svc")
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-24s $sec%8.2f s"); sec
    }
    val d = Tables.documents(s, dir)
    val isBatch = pmod(xxhash64(col("doc_id")), lit(mod)) === 7
    val corpus = d.where(!isBatch)

    val root = java.nio.file.Files.createTempDirectory("graft_q98svc")
    val (seen, index, fps, audit) = (s"$root/seen", s"$root/index",
      s"$root/fps", s"$root/audit")
    try {
      // The arriving batch lands as its OWN small parquet before the
      // timed arrival — a real service's micro-batch is a small source
      // read, not a filter carved out of the full corpus fixture at
      // arrival time (round-11: the carved form charged each arrival a
      // whole-fixture scan per consumer, a fixture artifact that grew
      // with the decade and masked the service's true shape).
      d.where(isBatch).select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(s"$root/arriving")
      val batch = s.read.parquet(s"$root/arriving")
      println(s"corpus=${corpus.count()} batch=${batch.count()} dir=$dir")
      t("seed stores") {
        corpus.select(col("doc_id"), col("text"))
          .write.parquet(s"$seen/mb_init")
        Dedup.minhashBandIndex(corpus, "doc_id", "text")
          .write.parquet(s"$index/mb_init")
        corpus.select(TextStats.fingerprint(col("text")).as("fp"))
          .write.parquet(s"$fps/mb_init")
      }
      t("one arrival (service)") {
        Admission.processMicroBatch(batch, 0L, "doc_id", "text",
          seen, index, fps, audit)
      }
      val n = s.read.option("recursiveFileLookup", "true").parquet(audit)
      println(s"audit rows: ${n.count()}, admitted: " +
        s"${n.where(col("admitted")).count()}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    s.stop()
  }
}
