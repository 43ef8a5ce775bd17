package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.{LangModel, Quality}
import org.apache.spark.sql.functions._

object ProbeDsir {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.build("probe-dsir")
    val d = Tables.documents(s, dir)
    val batch = d.where(col("doc_id") % 10 === 7)
    val corpus = d.where(col("doc_id") % 10 =!= 7)
    val scoredCorpus = Quality.scored(corpus.select(col("doc_id"), col("text")), "text")
    val tgt = LangModel.trainBigramLm(scoredCorpus.where(col("quality_kept")), "text")
    val src = LangModel.trainBigramLm(corpus, "text")
    val imp = LangModel.importance(batch, "doc_id", "text", tgt, src)
    val bq = Quality.scored(batch.select(col("doc_id"), col("text")), "text")
      .select(col("doc_id"), col("quality_kept"))
    imp.join(bq, Seq("doc_id")).where(col("n_bigrams") > 0)
      .groupBy(col("quality_kept"))
      .agg(count(lit(1)).as("n"),
        avg(col("importance_bits") * 1000.0 / col("n_bigrams")).as("milli_rate"),
        sum(when(col("importance_bits") >= 0, 1).otherwise(0)).as("nonneg"))
      .orderBy(col("quality_kept")).show(false)
    s.stop()
  }
}
