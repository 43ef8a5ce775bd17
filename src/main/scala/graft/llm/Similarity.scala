package graft.llm

import graft.functions.VectorKernels.{float_cosine, float_dot}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`ArrayType(FloatType)`): brute-force cosine top-k as the exact
  * baseline, plus two sublinear paths — random-hyperplane LSH buckets
  * and IVF coarse quantization — that bound the scored candidate set.
  *
  * Scale design: brute force is |Q|×|C| — fine for small query sets,
  * catastrophic all-pairs at 100 TB. LSH/IVF shuffle corpus once by
  * bucket key and score only same-bucket candidates; both broadcast the
  * (tiny) query set so the corpus never reshuffles per query.
  */
object Similarity {

  /** Exact top-k by cosine for each query vector (deterministic
    * tie-break on corpus id). Query side must be small — it is
    * broadcast; the corpus scan stays pipelined, the only shuffle is
    * the per-query top-k window. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("corpus_id"))
      .withColumn("cos", float_cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes (seeded, reproducible
    * across JVMs) for sign-LSH. */
  private[llm] def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numPlanes, dim)((rnd.nextGaussian()).toFloat)
  }

  /** Random-hyperplane signature: bit j = sign(v · h_j) (Charikar
    * 2002). Vectors with high cosine share sign patterns, so equal
    * signatures → strong candidates. */
  def lshSignature(df: DataFrame, vecCol: String, numPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val sigBits = (0 until numPlanes).map { j =>
      val h = typedLit(planes(j).toSeq)
      when(float_dot(col(vecCol), h) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("lsh_sig", sigBits)
  }

  /** ANN top-k via sign-LSH bucketing: score only corpus vectors whose
    * signature matches the query's (exact-bucket probe; multi-probe =
    * union over neighbor signatures, omitted for clarity). Recall vs
    * the exact baseline is asserted in LlmSpec. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numPlanes: Int = 12, dim: Int = 64): DataFrame = {
    val qs = broadcast(lshSignature(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "qv", numPlanes, dim))
    val cs = lshSignature(
      corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv")), "cv", numPlanes, dim)
    val cands = qs.join(cs,
      qs("lsh_sig") === cs("lsh_sig") && col("query_id") =!= col("corpus_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    cands.withColumn("cos", float_cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /** IVF (inverted-file) coarse quantization: corpus assigned to its
    * nearest of `nCentroids` centroids (here: deterministic sample of
    * corpus vectors — k-means iterations would refine, same plan
    * shape); queries probe `nProbe` nearest centroid lists only.
    * The classic FAISS-style scale path: candidate set shrinks by
    * ~nCentroids/nProbe versus brute force. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).cast("int").as("cent_id"), col(vecCol).as("cent_vec"))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1)) }
    val centArray = array(cents.map { case (i, v) =>
      struct(lit(i).as("cid"), typedLit(v).as("cv")) }: _*)

    def assign(df: DataFrame, vec: String, n: Int, out: String): DataFrame =
      df.withColumn("__scored",
          sort_array(transform(centArray, c =>
            struct((-float_cosine(col(vec), c.getField("cv"))).as("negcos"),
                   c.getField("cid").as("cid")))))
        .withColumn(out, transform(slice(col("__scored"), 1, n), s => s.getField("cid")))
        .drop("__scored")

    val c = assign(corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv")),
        "cv", 1, "cents")
      .withColumn("cent", element_at(col("cents"), 1)).drop("cents")
    val q = broadcast(assign(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        "qv", nProbe, "probes"))
    val cands = q.join(c,
      array_contains(col("probes"), col("cent")) && col("query_id") =!= col("corpus_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    cands.withColumn("cos", float_cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /** Oracle-safe exact top-k in the quantized integer domain (see
    * [[Dedup.cosineNearDupQuantized]] for why): rank by integer dot
    * product of 1e-3-quantized vectors, ties on corpus id. Scoring runs
    * through the codegen'd [[graft.functions.VectorKernels.long_dot]]
    * flat loop — not the boxed `aggregate(zip_with(...))` shape. */
  def quantizedDotTopK(queries: DataFrame, corpus: DataFrame,
                       idCol: String, vecCol: String, k: Int): DataFrame = {
    import graft.functions.VectorKernels.long_dot
    def quant(df: DataFrame, as: String, vas: String) =
      df.select(col(idCol).as(as),
        transform(col(vecCol), x => round(x.cast("double") * 1000).cast("long")).as(vas))
    val q = broadcast(quant(queries, "query_id", "qv"))
    val c = quant(corpus, "corpus_id", "cv")
    val scored = q.join(c, col("query_id") =!= col("corpus_id"))
      .withColumn("dot", long_dot(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("dot"), col("rank"))
  }
}
