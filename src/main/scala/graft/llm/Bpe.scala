package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE merge training (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" §3.2) — the
  * iterative continuation of [[Spans.vocabulary]]'s counting pass: in
  * each round, count adjacent symbol-pair frequencies across the word
  * table (weighted by word occurrence count), merge the most frequent
  * pair everywhere, record it. The merge list IS the tokenizer model.
  *
  * Scale shape (100 TB): training runs over the DISTINCT-WORD table
  * (one explode + hash-agg over the corpus builds it — vocabulary
  * grows sub-linearly in corpus size), so each round is
  *  1. one map-side pair explode + hash agg over the word table,
  *  2. a `limit(1)` TakeOrdered collect — ONE row to the driver,
  *  3. one codegen'd rewrite pass
  *     ([[graft.functions.BpeKernels.merge_pair]]) over the word
  *     table, `localCheckpoint`ed to cut the growing lineage —
  *     the same one-job-per-round discipline as
  *     [[Dedup.connectedComponents]]'s pointer jumping.
  * Nothing per-round scales with the CORPUS — only with the
  * vocabulary, which must fit the cluster anyway to train any
  * tokenizer on it.
  *
  * Determinism: ties on pair count break by (left, right) symbol
  * order — byte order on both engines for the alnum-filtered
  * alphabet — so the merge SEQUENCE is reproducible anywhere; the
  * q81 oracle replays all rounds in DuckDB (bounded unrolling) and
  * hash-gates the full sequence.
  */
object Bpe {

  /** One trained merge: rank (1-based round), the pair, its
    * concatenation, and the pair's weighted frequency when chosen. */
  final case class Merge(merge_rank: Int, lhs: String, rhs: String,
                         merged: String, pair_count: Long)

  /** The word table BPE trains on: occurrence-counted alnum tokens,
    * each split into single-character symbols. The `[a-z0-9]+` filter
    * keeps the symbol alphabet ASCII so the paren-delimited DuckDB
    * oracle twin and byte-order tie-breaks are exact. */
  /** The corpus tokens BPE sees: whitespace tokens of lower(trim())
    * restricted to the alnum alphabet (see [[wordCounts]]). Public so
    * the encode-side query tokenizes identically to training. */
  def alnumTokens(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(Spans.nonEmptyTokens(text), w => w.rlike("^[a-z0-9]+$"))

  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(alnumTokens(col(textCol))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))))

  /** Train `rounds` merges; returns them as a DataFrame ordered by
    * rank (row count = rounds, or fewer if the vocabulary exhausts —
    * no mergeable pair remains). */
  def trainMerges(docs: DataFrame, textCol: String,
                  rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10000,
      s"rounds out of range: $rounds")
    val spark = docs.sparkSession
    var words = wordCounts(docs, textCol)
      .select(col("cnt"), col("syms")).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      // pair counts: map-side explode + hash agg over the word table;
      // the argmax is a TakeOrdered over (count desc, pair) — one row
      // ships to the driver per round
      val top = words
        .where(size(col("syms")) >= 2)
        .select(col("cnt"), explode(
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("l"),
                        element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        val c = top(0).getLong(2)
        merges += Merge(round, l, r, l + r, c)
        val old = words
        words = words
          .withColumn("syms",
            graft.functions.BpeKernels.merge_pair(col("syms"), l, r))
          .localCheckpoint()
        old.unpersist()
        round += 1
      }
    }
    mergesToDf(spark, merges.toSeq)
  }

  private def mergesToDf(spark: SparkSession,
                         merges: Seq[Merge]): DataFrame = {
    val schema = StructType(Seq(
      StructField("merge_rank", IntegerType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.map(m =>
        Row(m.merge_rank, m.lhs, m.rhs, m.merged, m.pair_count)), 1),
      schema)
  }

  /** Persist a trained merge table — the tokenizer MODEL ARTIFACT any
    * downstream trainer needs — as parquet at `path`. One file: the
    * model is vocabulary-sized (one row per merge), and a single file
    * keeps the artifact atomic-rename-friendly for model registries. */
  def saveMerges(merges: DataFrame, path: String): Unit =
    merges.select(col("merge_rank"), col("lhs"), col("rhs"),
        col("merged"), col("pair_count"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a persisted merge table back into the rank-ordered pair
    * list [[encodeTokens]] consumes. The collect is MODEL-sized (one
    * row per trained merge — the same object every executor must hold
    * to encode anything), never corpus-sized. SpansSpec pins the
    * round-trip: encode(load(save(train))) == encode(train). */
  def loadMergePairs(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path)
      .orderBy(col("merge_rank"))
      .select(col("lhs"), col("rhs"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  /** Apply a trained merge sequence to a token column — the ENCODE
    * side of the tokenizer: split to characters, then replay every
    * merge in rank order through the codegen'd rewrite kernel. */
  def encodeTokens(docs: DataFrame, tokenCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    // sequence(1, 0) generates DESCENDING [1, 0] in Spark, so an
    // empty token must short-circuit to an empty symbol array rather
    // than two empty-string symbols; a NULL token stays NULL (the
    // kernel chain is null-preserving, so the column stays NULL).
    val chars = when(col(tokenCol).isNull, lit(null).cast("array<string>"))
      .when(length(col(tokenCol)) > 0,
        transform(sequence(lit(1), length(col(tokenCol))),
          i => col(tokenCol).substr(i, lit(1))))
      .otherwise(array().cast("array<string>"))
    val encoded = merges.foldLeft(chars) { case (syms, (l, r)) =>
      graft.functions.BpeKernels.merge_pair(syms, l, r)
    }
    docs.withColumn("bpe_symbols", encoded)
  }
}
