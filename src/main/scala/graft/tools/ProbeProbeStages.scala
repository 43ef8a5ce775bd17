package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.llm.Dedup

/** Dev probe (r17): stage-level timing INSIDE minhashProbePairs'
  * pipeline at one SF — newSh cache, candidate cache (index agg +
  * bucket pipeline), verify leg — to see which stage carries the
  * probe's wall time. Usage: runMain graft.tools.ProbeProbeStages [sfDir]
  */
object ProbeProbeStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Sessions.build("probe-probe-stages")
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Unit = {
      s.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); f
      println(f"STAGE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val d = Tables.documents(s, dir)
    t("warmup")(noop(d))
    val batch = d.where(col("doc_id") % 10 === 7)
    val corpus = d.where(col("doc_id") % 10 =!= 7)
    (1 to 2).foreach { round =>
      val index = Dedup.minhashBandIndex(corpus, "doc_id", "text")
      // --- reconstruct minhashProbePairs' internals, timed ---
      var newSh: DataFrame = null
      t(s"r$round newSh eager") {
        newSh = graft.core.Caching.eager(
          batch.select(col("doc_id").cast("long").as("id"),
            Dedup.shingles(col("text"), 2).as("sh")))
      }
      val newBanded = Dedup.bandedSignatures(newSh, 16, 4)
      val unioned = index
        .select(col("id").cast("long").as("id"), col("band"), col("band_hash"))
        .withColumn("is_new", lit(false))
        .unionByName(newBanded.withColumn("is_new", lit(true)))
      val hot = broadcast(
        newBanded.select(col("band"), col("band_hash")).distinct())
      var cand: DataFrame = null
      t(s"r$round cand eager (index agg + buckets)") {
        cand = graft.core.Caching.eager(unioned
          .join(hot, Seq("band", "band_hash"), "left_semi")
          .groupBy(col("band"), col("band_hash"))
          .agg(collect_list(struct(col("id"), col("is_new"))).as("ms"))
          .where(size(col("ms")).between(2, 500))
          .select(explode(col("ms")).as("a"), col("ms"))
          .select(col("a"), explode(col("ms")).as("b"))
          .where(col("a.id") < col("b.id") && (col("a.is_new") || col("b.is_new")))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            col("a.is_new").as("new_a"), col("b.is_new").as("new_b"))
          .distinct())
      }
      t(s"r$round verify leg") {
        val oldIds = cand.where(!col("new_a")).select(col("id_a").as("id"))
          .union(cand.where(!col("new_b")).select(col("id_b").as("id")))
          .distinct()
        val oldSh = corpus
          .join(broadcast(oldIds.select(col("id").as("__cand_id"))),
            col("doc_id").cast("long") === col("__cand_id"), "left_semi")
          .select(col("doc_id").cast("long").as("id"),
            Dedup.shingles(col("text"), 2).as("sh"))
        val allSh = newSh.unionByName(oldSh)
        noop(cand
          .join(allSh.as("sa"), col("id_a") === col("sa.id"))
          .join(allSh.as("sb"), col("id_b") === col("sb.id"))
          .withColumn("n_inter",
            size(array_intersect(col("sa.sh"), col("sb.sh"))))
          .select(col("id_a"), col("id_b"),
            (col("n_inter").cast("double") /
              (size(col("sa.sh")) + size(col("sb.sh")) - col("n_inter")))
              .as("jaccard"))
          .where(col("jaccard") >= 0.8))
      }
      s.catalog.clearCache()
      // the index agg alone, for reference
      t(s"r$round index agg alone") {
        noop(Dedup.minhashBandIndex(corpus, "doc_id", "text"))
      }
      s.catalog.clearCache()
    }
    s.stop()
  }
}
