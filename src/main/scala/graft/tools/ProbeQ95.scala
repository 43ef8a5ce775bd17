package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Dev probe backing the q95 SCALE.md rows: does the incremental probe
  * ([[graft.llm.Dedup.minhashProbePairs]]) cost scale with the BATCH
  * while full recompute scales with the CORPUS?
  *
  * Design: the arriving batch is held ~FIXED-SIZE (hash-modulo
  * selection: xxhash64(doc_id) % MOD == 7, with MOD scaled per decade
  * so the batch stays ~500 docs) while the corpus grows with the
  * fixture decade (sf0.1 → sf1 → sf10). Three timed legs per decade:
  *   1. index build+persist — the amortized cost a growing corpus pays
  *      once per doc (written as parquet, the artifact shape);
  *   2. probe — batch vs stored index, index read back from parquet;
  *   3. full recompute — minhashNearDupPairs over corpus+batch, the
  *      cost the index avoids.
  * If the claim holds, leg 2 grows sub-linearly (only the index scan
  * term grows; bucket shuffle and verify stay batch-sized) while leg 3
  * grows ~linearly with the corpus.
  *
  * All legs force through the noop sink (no count() collapse). */
object ProbeQ95 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mod = sys.env.getOrElse("SPARK_GRAFT_BATCH_MOD", "10").toLong
    val s = Sessions.build("probe-q95")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-24s $sec%8.2f s"); sec
    }

    val d = Tables.documents(s, dir)
    t("warmup")(noop(d))
    val isBatch = pmod(xxhash64(col("doc_id")), lit(mod)) === 7
    val batch = d.where(isBatch)
    val corpus = d.where(!isBatch)
    println(s"corpus=${corpus.count()} batch=${batch.count()} dir=$dir")

    val idxDir = java.nio.file.Files.createTempDirectory("graft_q95_idx")
    try {
      t("index build+persist") {
        Dedup.minhashBandIndex(corpus, "doc_id", "text")
          .write.mode("overwrite").parquet(idxDir.toString)
      }
      val stored = s.read.parquet(idxDir.toString)
      val probeSec = t("probe vs stored index") {
        noop(Dedup.minhashProbePairs(corpus, batch, "doc_id", "text",
          stored, threshold = 0.8))
      }
      val emitted = Dedup.minhashProbePairs(corpus, batch, "doc_id", "text",
        stored, threshold = 0.8).count()
      println(s"probe pairs emitted: $emitted")
      t("full recompute") {
        noop(Dedup.minhashNearDupPairs(d, "doc_id", "text", 0.8, 2, 16, 4))
      }
      println(f"probe leg: $probeSec%.2f s for $emitted pairs")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(idxDir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    s.stop()
  }
}
