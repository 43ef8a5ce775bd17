package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.LangModel
import org.apache.spark.sql.functions._

/** Dev probe: bits-per-bigram distribution of the LM surprisal gate at
  * a given sfDir — picks thetaMilli for q99 from measured percentiles. */
object ProbeLm {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val s = Sessions.build("probe-lm")
    val d = Tables.documents(s, dir)
    val batch = d.where(col("doc_id") % 10 === 7)
    val corpus = d.where(col("doc_id") % 10 =!= 7)
    val (uni, bi, total) = LangModel.trainBigramLm(corpus, "text")
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
