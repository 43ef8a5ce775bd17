package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.LangModel
import org.apache.spark.sql.functions._

/** Dev probe backing q99: bits-per-bigram distribution (theta pick)
  * plus timed train/score legs per fixture decade, at minCount 1 and a
  * pruned LM (SPARK_GRAFT_LM_MINCOUNT) — the KenLM-prune story: the
  * bigram table the scorer joins shrinks, backoff takes the pruned
  * mass, scoring cost falls. Legs force through the noop sink. */
object ProbeLm {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val minCount = sys.env.getOrElse("SPARK_GRAFT_LM_MINCOUNT", "1").toLong
    val uniFloor = sys.env.getOrElse("SPARK_GRAFT_LM_UNIFLOOR", "1").toLong
    val s = Sessions.build("probe-lm")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-24s $sec%8.2f s"); sec
    }
    val d = Tables.documents(s, dir)
    val batch = d.where(col("doc_id") % 10 === 7)
    val corpus = d.where(col("doc_id") % 10 =!= 7)
    t("warmup")(noop(d))
    println(s"docs=${d.count()} minCount=$minCount uniFloor=$uniFloor dir=$dir")
    val (uni, bi, total) =
      LangModel.trainBigramLm(corpus, "text", minCount, uniFloor)
    t("train (uni+bi+total)") { noop(uni); noop(bi); noop(total) }
    println(s"lm rows: uni=${uni.count()} bi=${bi.count()}")
    t("score batch") {
      noop(LangModel.surprisal(batch, "doc_id", "text", uni, bi, total))
    }
    val sc = LangModel.surprisal(batch, "doc_id", "text", uni, bi, total)
      .where(col("n_bigrams") > 0)
      .withColumn("milli_bits_per_gram",
        col("bits") * 1000L / col("n_bigrams"))
    sc.select(
      percentile_approx(col("milli_bits_per_gram"),
        array(lit(0.1), lit(0.25), lit(0.5), lit(0.75), lit(0.9)), lit(1000))
        .as("pcts")).show(false)
    s.stop()
  }
}
