package graft.llm

import graft.ops.Cleaning
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the training-batch assembly step: each shard's
  * documents are concatenated in a deterministic order and cut into
  * fixed `budget`-token training sequences (GPT-style concat-and-chunk;
  * a document crossing a cut boundary occupies several consecutive
  * bins). Everything is exact integer arithmetic over a per-shard
  * prefix sum, so the layout is bit-identical on any cluster.
  *
  * Scale shape: the prefix sum is a window partitioned by `shard` —
  * shards process in parallel and a shard is the realistic packing
  * unit anyway (one training worker's slice; packing across workers
  * would serialize them). Each shard's window is one partition: size
  * shards to worker granularity, not corpus granularity. The bin
  * explosion is bounded by n_tokens/budget rows per document.
  */
object Packing {

  /** Per-document packed span: with exclusive prefix sum p and token
    * count n (documents of zero tokens occupy one position), the doc
    * spans bins floor(p/budget) .. floor((p+max(n,1)-1)/budget) of its
    * shard. Output: (shard, id, n_tokens, cum_prev, bin_start,
    * bin_end).
    *
    * Determinism: the prefix sum orders by (id, n_tokens) — with
    * unique ids per shard (the normal case) the layout is
    * bit-identical on any partitioning; if ids DO repeat within a
    * shard, the secondary n_tokens key still fixes the order, and any
    * rows tied on both keys are identical in every output column, so
    * the result stays deterministic rather than silently depending on
    * partition order. */
  def packedSpans(docs: DataFrame, idCol: String, shardCol: String,
                  nTokens: Column, budget: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("id"), col("n_tokens"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(shardCol).as("shard"), col(idCol).as("id"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("cum_prev", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin_start",
        Cleaning.intDiv(col("cum_prev"), lit(budget.toLong)))
      .withColumn("bin_end",
        Cleaning.intDiv(
          col("cum_prev") + greatest(col("n_tokens"), lit(1L)) - lit(1L),
          lit(budget.toLong)))
  }

  /** Per-bin occupancy roll-up of [[packedSpans]]: for every (shard,
    * bin) training sequence, how many documents it touches, how many
    * START in it, and how many continue past it into the next bin
    * (the cross-boundary attention-mask cases). */
  def packedBins(spans: DataFrame): DataFrame =
    spans
      .select(col("shard"), col("bin_start"), col("bin_end"),
        explode(sequence(col("bin_start"), col("bin_end"))).as("bin"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("bin") === col("bin_start"), 1L).otherwise(0L))
          .as("n_starts"),
        sum(when(col("bin") < col("bin_end"), 1L).otherwise(0L))
          .as("n_crossers"))
}
