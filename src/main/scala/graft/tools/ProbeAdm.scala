package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.llm.Dedup

/** Dev probe (r17): stage-level wall time of the admission family's
  * registered shapes at one SF — which stage of
  * index → probe → audit actually costs. Each leg forced via noop.
  * Usage: runMain graft.tools.ProbeAdm [sfDir]
  */
object ProbeAdm {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Sessions.build("probe-adm")
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Unit = {
      s.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); f
      println(f"STAGE $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val d = Tables.documents(s, dir)
    t("warmup")(noop(d))
    val batch = d.where(col("doc_id") % 10 === 7)
    val corpus = d.where(col("doc_id") % 10 =!= 7)

    // q95 pieces
    (1 to 2).foreach { i =>
      t(s"index build (run $i)") {
        noop(Dedup.minhashBandIndex(corpus, "doc_id", "text"))
      }
      s.catalog.clearCache()
    }
    val index = Dedup.minhashBandIndex(corpus, "doc_id", "text")
    (1 to 2).foreach { i =>
      t(s"probePairs (run $i)") {
        noop(Dedup.minhashProbePairs(corpus, batch, "doc_id", "text",
          index, threshold = 0.8))
      }
      s.catalog.clearCache()
    }
    (1 to 2).foreach { i =>
      t(s"q95 full (run $i)") {
        noop(graft.SparkEntry.queries("q95_incremental_neardup")(s, dir))
      }
      s.catalog.clearCache()
    }
    // q98 = audit (gate + exact + probe)
    (1 to 2).foreach { i =>
      t(s"q98 full (run $i)") {
        noop(graft.SparkEntry.queries("q98_incremental_admission")(s, dir))
      }
      s.catalog.clearCache()
    }
    // audit sub-pieces: quality gate + fingerprints only
    t("gate+fp eager (batch)") {
      val g = graft.core.Caching.eager(graft.llm.Quality.scored(
          batch.select(col("doc_id"), col("text")), "text")
        .select(col("doc_id"), col("text"),
          col("quality_kept").as("gate_pass"))
        .withColumn("fp", graft.llm.TextStats.fingerprint(col("text"))))
      noop(g)
    }
    s.catalog.clearCache()
    // q103 media legs alone
    t("q103 full (run 1)") {
      noop(graft.SparkEntry.queries("q103_multimodal_admission")(s, dir))
    }
    s.catalog.clearCache()
    t("q103 full (run 2)") {
      noop(graft.SparkEntry.queries("q103_multimodal_admission")(s, dir))
    }
    s.catalog.clearCache()
    s.stop()
  }
}
