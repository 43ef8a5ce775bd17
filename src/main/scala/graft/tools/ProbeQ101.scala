package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.{Dedup, Multimodal}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe backing the q101 SCALE.md analysis: per-modality pair
  * volumes and the pair-generation vs connected-components split of
  * the full-modality freeze, per fixture decade — where does the
  * composition's cost beyond its members' sum go? Noop forcing. */
object ProbeQ101 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.build("probe-q101")
    val jt0 = System.nanoTime()
    if (sys.env.contains("SPARK_GRAFT_TRACE"))
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val stages = j.stageInfos.map(si =>
              s"${si.stageId}[${si.numTasks}]").mkString(" ")
            println(f"  t=${(System.nanoTime() - jt0) / 1e9}%7.2f job ${j.jobId} $stages")
          }
        })
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-24s $sec%8.2f s"); sec
    }
    // SPARK_GRAFT_ONLY=text|image|audio runs one modality in a clean
    // session (isolates CC cost from the other legs' session state)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    def want(m: String): Boolean = only.forall(_ == m)
    val d = Tables.documents(s, dir)
    println(s"docs=${d.count()} dir=$dir")
    def ccLeg(name: String, edges: DataFrame): Unit = {
      val cached = graft.core.Caching.eager(
        edges.select(col("id_a").as("src"), col("id_b").as("dst")))
      println(s"$name pairs: ${cached.count()}")
      t(s"$name CC") {
        noop(Dedup.connectedComponents(cached))
      }
      val stats = Dedup.connectedComponents(cached)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("components"), max(col("n")).as("widest"),
          avg(col("n")).as("mean_width"))
        .collect()(0)
      println(s"$name components=${stats.getLong(0)} widest=${stats.getLong(1)} " +
        f"mean=${stats.getDouble(2)}%.1f")
      cached.unpersist()
    }
    if (want("text")) {
      t("text pairs gen") {
        noop(Dedup.minhashNearDupPairs(d, "doc_id", "text", 0.8, 2, 16, 4))
      }
      ccLeg("text",
        Dedup.minhashNearDupPairs(d, "doc_id", "text", 0.8, 2, 16, 4))
    }
    if (want("image")) {
      val imgs = Multimodal.syntheticImageTable(d.select(col("doc_id")),
        "doc_id")
      t("image pairs gen") {
        noop(Multimodal.imageNearDupPairs(imgs, "media_id", "payload"))
      }
      ccLeg("image",
        Multimodal.imageNearDupPairs(imgs, "media_id", "payload"))
    }
    if (want("audio")) {
      val wavs = Multimodal.syntheticAudioTable(d.select(col("doc_id")),
        "doc_id")
      t("audio pairs gen") {
        noop(Multimodal.audioNearDupPairs(wavs, "media_id", "payload"))
      }
      ccLeg("audio",
        Multimodal.audioNearDupPairs(wavs, "media_id", "payload"))
    }
    s.stop()
  }
}
