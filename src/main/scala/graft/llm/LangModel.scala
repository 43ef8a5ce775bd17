package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality filtering — the CCNet / LLaMA-data
  * "perplexity gate": score every document by how surprising its token
  * sequence is under a bigram LM trained on a reference corpus, and
  * keep the low-perplexity head. (CCNet trains KenLM on Wikipedia and
  * buckets Common Crawl by perplexity; the operator here is that
  * shape with the LM as a TABLE the engine joins against.)
  *
  * Cross-engine exactness: real log-probabilities are floats and do
  * not hash-compare across engines, so the score is integer
  * "surprisal bits" — floor(log2 x) computed as the bit length of x
  * (`length(bin(x)) - 1`, identical in Spark and DuckDB). Per doc
  * bigram (prev, w), occurring k times:
  *   - seen bigram:   bits = L(c(prev)) - L(c(prev,w))   (≈ -log2 P)
  *   - unseen bigram: bits = Backoff + L(T) - L(c(w))    (unigram)
  *   - OOV word:      bits = Backoff + L(T)
  * with L = floor-log2, T = total reference tokens, Backoff = 4 bits.
  * A doc is kept iff 1000·Σbits <= thetaMilli·n_bigrams (exact
  * cross-multiplied integers; docs with no bigram are vacuously
  * kept — length gates are a different operator's job).
  *
  * Scale shape: the LM is (prev, w, counts) tables built with plain
  * hash-aggs; scoring explodes each doc's bigrams, PRE-AGGREGATES per
  * (doc, prev, w) so a 1000-repeat boilerplate bigram joins once and
  * multiplies by k, then shuffle-joins the bigram table and the two
  * unigram sides. At 100 TB the LM prunes (`minCount`) exactly like
  * KenLM prunes singletons — pruned bigrams fall through to the
  * unigram backoff arm BY THE SAME RULE the oracle replays, and the
  * join's build side shrinks toward broadcastable. */
object LangModel {

  val BackoffBits = 4L

  /** floor(log2 x) for x >= 1, as exact integer arithmetic both
    * engines share: the bit length of x minus one. */
  private def floorLog2(x: Column): Column = length(bin(x)) - lit(1)

  private def bigrams(textCol: Column): Column = {
    val w = Bpe.alnumTokens(textCol)
    when(size(w) >= 2,
      zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => struct(a.as("prev"), b.as("w"))))
      .otherwise(array().cast("array<struct<prev:string,w:string>>"))
  }

  /** Train the bigram LM on a reference corpus: returns
    * (unigrams(w, cu), bigrams(prev, w, cb), totalTokens). `minCount`
    * prunes rare bigrams from the table (KenLM-style) — scoring then
    * backs off for them, exactly as for never-seen pairs.
    *
    * `uniFloor = 2` additionally drops SINGLETON unigrams — the
    * OOV-PRESERVING count floor, and on web-scale reference corpora
    * the dominant table cut (real vocabularies are singleton-heavy:
    * the tailed 5M-doc fixture's uni table is 18.9M rows, ~95%
    * singletons, joined TWICE by every scoring pass). EXACT by the
    * integer-bits arithmetic, not an approximation: a dropped w
    * falls from the backoff arm `Backoff + L(T) − L(cu_w)` to the
    * OOV arm `Backoff + L(T)`, and for cu_w = 1 those coincide
    * (floorLog2(1) = 0) — so scores are bit-identical (spec-pinned).
    * Requires `minCount >= 2`: a surviving cb = 1 bigram would
    * reference its prev's singleton count in the first arm, which the
    * floor removes (cb >= 2 forces cu_prev >= 2, so the seen-bigram
    * arm never touches a dropped row). Floors above 2 would CHANGE
    * scores (floorLog2(2) = 1 != 0) — rejected. */
  def trainBigramLm(ref: DataFrame, textCol: String, minCount: Long = 1L,
                    uniFloor: Long = 1L)
      : (DataFrame, DataFrame, DataFrame) = {
    require(uniFloor == 1L || uniFloor == 2L,
      s"uniFloor must be 1 (off) or 2 (drop singletons — the only " +
        s"score-preserving floor); got $uniFloor")
    require(uniFloor == 1L || minCount >= 2L,
      "uniFloor = 2 needs minCount >= 2: a surviving cb = 1 bigram " +
        "references its singleton prev in the seen-bigram arm")
    val toks = ref.select(explode(Bpe.alnumTokens(col(textCol))).as("w"))
    // NOT cached, deliberately (r17 refuted attempt): the two uni-join
    // sides in every scoring pass are IDENTICAL subtrees, so Spark's
    // ReuseExchange already computes the unigram aggregation once per
    // executed plan — an eager cache only added its materialization
    // job (measured: q99 1.57 → 1.92 s, q100 3.73 → 4.10 s at sf0.1,
    // reverted same round).
    val uni0 = toks.groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val uni = if (uniFloor > 1L) uni0.where(col("cu") >= uniFloor) else uni0
    val bi = ref.select(explode(bigrams(col(textCol))).as("g"))
      .groupBy(col("g.prev").as("prev"), col("g.w").as("w"))
      .agg(count(lit(1)).as("cb"))
      .where(col("cb") >= minCount)
    val total = toks.agg(count(lit(1)).as("t_tokens"))
    (uni, bi, total)
  }

  /** Per-document surprisal: (idCol..., n_bigrams, bits) — exact
    * integers. The three LM joins run on the per-(doc, prev, w)
    * PRE-AGGREGATED bigram multiset, never per occurrence. */
  def surprisal(docs: DataFrame, idCol: String, textCol: String,
                uni: DataFrame, bi: DataFrame, total: DataFrame)
      : DataFrame =
    surprisalFromBigrams(docs.select(col(idCol)), idCol,
      perDocBigrams(docs, idCol, textCol), uni, bi, total)

  /** The candidate side's bigram multiset — the expensive stage
    * (tokenize + explode + hash-agg); factored so a two-LM consumer
    * ([[importance]]) pays it once. */
  private def perDocBigrams(docs: DataFrame, idCol: String,
                            textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(bigrams(col(textCol))).as("g"))
      .groupBy(col(idCol), col("g.prev").as("prev"), col("g.w").as("w"))
      .agg(count(lit(1)).as("k"))

  private def surprisalFromBigrams(docIds: DataFrame, idCol: String,
                                   perDocBigram: DataFrame, uni: DataFrame,
                                   bi: DataFrame, total: DataFrame)
      : DataFrame = {
    val scored = perDocBigram
      .join(bi, Seq("prev", "w"), "left")
      .join(uni.select(col("w").as("prev"), col("cu").as("cu_prev")),
        Seq("prev"), "left")
      .join(uni.select(col("w"), col("cu").as("cu_w")), Seq("w"), "left")
      .crossJoin(total)
      .withColumn("__bits",
        when(col("cb").isNotNull, floorLog2(col("cu_prev")) - floorLog2(col("cb")))
          .when(col("cu_w").isNotNull,
            lit(BackoffBits) + floorLog2(col("t_tokens")) - floorLog2(col("cu_w")))
          .otherwise(lit(BackoffBits) + floorLog2(col("t_tokens"))))
    val agg = scored.groupBy(col(idCol))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k") * col("__bits")).cast("long").as("bits"))
    docIds
      .join(agg, Seq(idCol), "left")
      .na.fill(0L, Seq("n_bigrams", "bits"))
  }

  /** The gate: adds `lm_kept` = 1000·bits <= thetaMilli·n_bigrams
    * (exact; empty docs vacuously kept). */
  def gate(scoredDocs: DataFrame, thetaMilli: Long): DataFrame =
    scoredDocs.withColumn("lm_kept",
      col("bits") * 1000L <= lit(thetaMilli) * col("n_bigrams"))

  /** DSIR-style importance (Xie et al. 2023, "Data Selection for LMs
    * via Importance Resampling", with surprisal bits standing in for
    * the hashed-n-gram log-likelihoods): importance of a candidate =
    * its bits under the SOURCE (raw-pool) LM minus its bits under the
    * TARGET (what-we-want) LM — positive means the doc looks more like
    * the target than like the pool, exactly log(p_tgt/p_src) up to the
    * integer-bits quantization. Returns (idCol, n_bigrams,
    * importance_bits); both scoring passes share ONE cached
    * pre-aggregated bigram multiset (the tokenize+explode+agg stage
    * runs once, not per LM), and docs with no bigrams get
    * importance 0 (neutral). */
  def importance(docs: DataFrame, idCol: String, textCol: String,
                 target: (DataFrame, DataFrame, DataFrame),
                 source: (DataFrame, DataFrame, DataFrame)): DataFrame = {
    val pdb = graft.core.Caching.eager(perDocBigrams(docs, idCol, textCol))
    val docIds = docs.select(col(idCol))
    val tgt = surprisalFromBigrams(docIds, idCol, pdb,
        target._1, target._2, target._3)
      .select(col(idCol), col("n_bigrams"), col("bits").as("__tgt_bits"))
    val src = surprisalFromBigrams(docIds, idCol, pdb,
        source._1, source._2, source._3)
      .select(col(idCol), col("bits").as("__src_bits"))
    tgt.join(src, Seq(idCol))
      .withColumn("importance_bits", col("__src_bits") - col("__tgt_bits"))
      .drop("__tgt_bits", "__src_bits")
  }
}
