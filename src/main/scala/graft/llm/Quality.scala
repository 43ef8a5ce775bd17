package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned document-quality gating — the fastText-style classifier
  * gate (see [[graft.functions.QualityScore64]] for the model and its
  * exact-integer contract) that RefinedWeb/DCLM-class pipelines run
  * between heuristic filtering and dedup. Inference only; the weight
  * table is a fixture.
  *
  * All map-side until the caller's rollup: tokenize → one codegen'd
  * kernel pass → two integer columns. At 100 TB this is a pure scan
  * stage — no shuffle, no state, embarrassingly parallel. */
object Quality {

  /** Adds `quality_weight_sum`, `quality_grams` and the boolean
    * `quality_kept` (1000·Σw > θ·n, cross-multiplied — exact) to the
    * input. NULL text scores as an empty document: 0 grams, not kept. */
  def scored(df: DataFrame, textCol: String): DataFrame = {
    val reserved = Set("__qs", "quality_weight_sum", "quality_grams",
      "quality_kept")
    require(df.columns.forall(c => !reserved.contains(c)),
      s"input already has a reserved column: " +
        df.columns.toSet.intersect(reserved))
    val qs = graft.functions.QualityScore64.quality_score(
      Bpe.alnumTokens(col(textCol)))
    df.withColumn("__qs", qs)
      .withColumn("quality_weight_sum", col("__qs").getItem(0))
      .withColumn("quality_grams", col("__qs").getItem(1))
      .withColumn("quality_kept",
        col("quality_weight_sum") * 1000L >
          lit(graft.functions.QualityScore64.ThetaMilli) * col("quality_grams"))
      .drop("__qs")
  }

  /** Per-group gate-rate rollup: docs, kept docs, gram and weight
    * totals — the audit table a corpus-prep run logs per source. */
  def gateRollup(df: DataFrame, textCol: String,
                 groupCol: String): DataFrame =
    scored(df, textCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("quality_kept"), 1L).otherwise(0L)).as("kept_docs"),
        sum(col("quality_grams")).as("grams"),
        sum(col("quality_weight_sum")).as("weight_sum"))
}
