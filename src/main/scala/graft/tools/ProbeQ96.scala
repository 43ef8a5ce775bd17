package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Dev probe backing the q96 SCALE.md rows: does the persisted-IVF
  * probe ([[graft.llm.Similarity.ivfProbeTopK]]) hold per-batch cost
  * ~flat as the corpus grows, while brute force grows linearly?
  *
  * Design mirrors ProbeQ95: the arriving query batch is held
  * ~FIXED-SIZE (hash-modulo selection, MOD scaled per decade to keep
  * ~100 queries) while the corpus grows with the fixture decade
  * (sf0.1 → sf1 → sf10 = 2k → 20k → 200k vectors). The index follows
  * FAISS practice: nlist (nCentroids) grows with the corpus so each
  * inverted list stays ~constant-size, nProbe stays fixed — so the
  * candidate set a query scans is ~FLAT per decade by construction,
  * and the probe leg should be too (its only corpus-growth terms are
  * the pruned partition reads). Three timed legs per decade:
  *   1. index build+persist — centroids + cent-partitioned inverted
  *      lists written as parquet (the artifact shape; amortized cost);
  *   2. probe — batch vs the STORED index read back from parquet, so
  *      the literal `cent IN` prunes real partitions;
  *   3. brute force — exact cosine top-k over the full corpus, the
  *      cost the index avoids.
  * Recall vs the exact quantized top-k is printed per decade so the
  * flat-cost claim can't ride on silently degraded quality.
  *
  * All legs force through the noop sink (no count() collapse). */
object ProbeQ96 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mod = sys.env.getOrElse("SPARK_GRAFT_BATCH_MOD", "20").toLong
    val nCentroids = sys.env.getOrElse("SPARK_GRAFT_NLIST", "16").toInt
    // 0 = the operator's scan-fraction-held default
    // (min(nlist, max(8, ceil(nlist/4))))
    val nProbe = sys.env.getOrElse("SPARK_GRAFT_NPROBE", "0").toInt
    val refine = sys.env.getOrElse("SPARK_GRAFT_REFINE", "0").toInt
    val sample = sys.env.getOrElse("SPARK_GRAFT_SAMPLE",
      math.max(2048, 8 * nCentroids).toString).toInt
    val s = Sessions.build("probe-q96")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-24s $sec%8.2f s"); sec
    }

    val emb = Tables.embeddings(s, dir)
    t("warmup")(noop(emb))
    val isBatch = pmod(xxhash64(col("vec_id")), lit(mod)) === 7
    val queries = emb.where(isBatch)
    val corpus = emb.where(!isBatch)
    println(s"corpus=${corpus.count()} queries=${queries.count()} " +
      s"nlist=$nCentroids nprobe=$nProbe dir=$dir")

    val idxDir = java.nio.file.Files.createTempDirectory("graft_q96_idx")
    try {
      var centroids: org.apache.spark.sql.DataFrame = null
      t("index build+persist") {
        centroids = Similarity.ivfCentroids(corpus, "vec_id", "embedding",
          nCentroids = nCentroids, sampleSize = sample, refineIters = refine)
        centroids.write.mode("overwrite")
          .parquet(idxDir.toString + "/centroids")
        Similarity.ivfIndexAssignments(corpus, "vec_id", "embedding",
            centroids)
          .write.mode("overwrite").partitionBy("cent")
          .parquet(idxDir.toString + "/lists")
      }
      val storedCents = s.read.parquet(idxDir.toString + "/centroids")
      val storedLists = s.read.parquet(idxDir.toString + "/lists")
      val probeSec = t("probe vs stored index") {
        noop(Similarity.ivfProbeTopK(queries, storedLists, storedCents,
          "vec_id", "embedding", k = 5, nProbe = nProbe))
      }
      t("full IVF recompute") {
        noop(Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
          k = 5, nCentroids = nCentroids, nProbe = nProbe,
          sampleSize = sample))
      }
      t("brute force") {
        noop(Similarity.bruteForceTopK(queries, corpus, "vec_id",
          "embedding", k = 5))
      }
      val ann = Similarity.ivfProbeTopK(queries, storedLists, storedCents,
          "vec_id", "embedding", k = 5, nProbe = nProbe)
        .select(col("query_id"), col("corpus_id"), lit(1L).as("__hit"))
      val r = Similarity.quantizedDotTopK(queries, corpus, "vec_id",
          "embedding", k = 5)
        .join(ann, Seq("query_id", "corpus_id"), "left")
        .agg((sum(coalesce(col("__hit"), lit(0L))) / count(lit(1)))
          .as("recall"))
        .collect()(0).getDouble(0)
      println(f"probe leg: $probeSec%.2f s, recall@5 vs exact: $r%.4f")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(idxDir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    s.stop()
  }
}
