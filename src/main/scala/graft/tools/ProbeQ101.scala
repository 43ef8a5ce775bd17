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
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-24s $sec%8.2f s"); sec
    }
    val d = Tables.documents(s, dir)
    println(s"docs=${d.count()} dir=$dir")
    def ccLeg(name: String, edges: DataFrame): Unit = {
      val cached = graft.core.Caching.eager(
        edges.select(col("id_a").as("src"), col("id_b").as("dst")))
      println(s"$name pairs: ${cached.count()}")
      t(s"$name CC") {
        noop(Dedup.connectedComponents(cached))
      }
      cached.unpersist()
    }
    t("text pairs gen") {
      noop(Dedup.minhashNearDupPairs(d, "doc_id", "text", 0.8, 2, 16, 4))
    }
    ccLeg("text",
      Dedup.minhashNearDupPairs(d, "doc_id", "text", 0.8, 2, 16, 4))
    val imgs = Multimodal.syntheticImageTable(d.select(col("doc_id")),
      "doc_id")
    t("image pairs gen") {
      noop(Multimodal.imageNearDupPairs(imgs, "media_id", "payload"))
    }
    ccLeg("image",
      Multimodal.imageNearDupPairs(imgs, "media_id", "payload"))
    val wavs = Multimodal.syntheticAudioTable(d.select(col("doc_id")),
      "doc_id")
    t("audio pairs gen") {
      noop(Multimodal.audioNearDupPairs(wavs, "media_id", "payload"))
    }
    ccLeg("audio",
      Multimodal.audioNearDupPairs(wavs, "media_id", "payload"))
    s.stop()
  }
}
