package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.{Dedup, TextStats}
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the q30 minhash near-dup path. */
object ProbeQ30 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.build("probe-q30")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val d = Tables.documents(s, dir)
    t("warmup")(d.count())
    val base = t("base fingerprint+eager") {
      graft.core.Caching.eager(d.select(col("doc_id").as("id"), col("text"),
        TextStats.fingerprint(col("text")).as("fp")))
    }
    val reps = base.groupBy(col("fp"))
      .agg(min(col("id")).as("id"), min_by(col("text"), col("id")).as("text"))
    val sh = t("shingles+eager") {
      graft.core.Caching.eager(reps.select(col("id"), col("fp"),
        Dedup.shingles(col("text"), 2).as("sh")))
    }
    val cands = t("lsh candidates") {
      val c = Dedup.candidatesFromShingles(
        sh.select(col("id"), col("sh")), 16, 4, 500)
      c.count(); c
    }
    val verified = t("verify jaccard") {
      val v = cands
        .join(sh.as("sa"), col("id_a") === col("sa.id"))
        .join(sh.as("sb"), col("id_b") === col("sb.id"))
        .withColumn("n_inter", size(array_intersect(col("sa.sh"), col("sb.sh"))))
        .select(col("id_a"), col("id_b"), col("sa.fp").as("fp_a"), col("sb.fp").as("fp_b"),
          (col("n_inter").cast("double") /
            (size(col("sa.sh")) + size(col("sb.sh")) - col("n_inter"))).as("jaccard"))
        .where(col("jaccard") >= 0.8)
      println("verified pairs: " + v.count()); v
    }
    t("full q30 fresh") {
      s.catalog.clearCache()
      Dedup.minhashNearDupPairs(d, "doc_id", "text", 0.8, 2, 16, 4)
        .orderBy(col("id_a"), col("id_b")).count()
    }
    t("full q30 again") {
      s.catalog.clearCache()
      Dedup.minhashNearDupPairs(d, "doc_id", "text", 0.8, 2, 16, 4)
        .orderBy(col("id_a"), col("id_b")).count()
    }
    s.stop()
  }
}
