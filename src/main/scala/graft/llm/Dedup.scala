package graft.llm

import graft.functions.SimHash64.simhash64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for corpus curation: exact, MinHash+LSH,
  * SimHash Hamming-banding, and exact n-gram Jaccard verification.
  *
  * Scale design: every method here is shuffle-bounded by |candidate
  * pairs|, never |all pairs|. Exact dedup is one hash aggregation;
  * MinHash/SimHash bucket with band joins (Broder 1997 resp. Manku
  * WWW'07 constructions) so only same-bucket docs ever meet; the O(n²)
  * verifier is applied strictly post-candidate.
  */
object Dedup {

  /** Word n-gram shingles of the lowercased text (n >= 1); documents
    * shorter than n words contribute their whole text as one shingle. */
  def shingles(text: Column, n: Int): Column = {
    val words = TextStats.tokens(text)
    if (n == 1) array_distinct(words)
    else array_distinct(
      when(size(words) >= n,
        transform(sequence(lit(1), size(words) - lit(n - 1)),
          i => concat_ws(" ", slice(words, i, lit(n)))))
        .otherwise(array(concat_ws(" ", words))))
  }

  /** Exact duplicate groups: hash-groupBy on the canonical fingerprint.
    * One shuffle on a 128-bit key; at 100 TB combine map-side first.
    * Returns (fingerprint, n_docs, min_doc_id representative). */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(TextStats.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** MinHash signature: `numHashes` permutations approximated by seeded
    * 64-bit hashes (min over shingles of xxhash64(seed ++ shingle)) —
    * Broder's min-wise independent permutations. Pure expressions:
    * one `transform`+`array_min` pair per hash, no UDF. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { j =>
      array_min(transform(shingleCol, s => xxhash64(lit(j), s)))
    }: _*)

  /** LSH candidate pairs: split the signature into `bands` bands of
    * `rows` values, bucket-join on (band index, band hash). Probability
    * a pair with Jaccard j collides: 1-(1-j^rows)^bands. Each band is
    * one groupBy shuffle keyed by a 64-bit hash — no all-pairs stage.
    *
    * Returns distinct (id_a, id_b) with id_a < id_b.
    */
  def minhashLshCandidates(df: DataFrame, idCol: String, textCol: String,
                           shingleN: Int = 2, bands: Int = 8, rows: Int = 2): DataFrame = {
    val numHashes = bands * rows
    val sig = df.select(col(idCol).as("id"),
      minhashSignature(shingles(col(textCol), shingleN), numHashes).as("sig"))
    val banded = sig.select(col("id"), posexplode(
      array((0 until bands).map { b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows).cast("string"))
      }: _*)).as(Seq("band", "band_hash")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity for given pairs (the post-LSH verifier):
    * explode shingles, join on shingle, |∩| / (|A|+|B|-|∩|). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int, maxId: Option[Long] = None): DataFrame = {
    val base = maxId.map(m => df.where(col(idCol) < m)).getOrElse(df)
    val toks = base.select(col(idCol).as("id"),
        explode(shingles(col(textCol), shingleN)).as("sh"))
    val sizes = toks.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val inter = toks.as("x").join(toks.as("y"),
        col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("n_inter"))).as("jaccard"))
  }

  /** SimHash near-dup candidates: 64-bit fingerprint split into
    * `bands` bit-bands; docs sharing any band are candidates; the
    * popcount of the XOR verifies Hamming distance <= `maxHamming`.
    * Detects near-dups that differ in <= (64/bands - 1)-bit-per-band
    * patterns with one shuffle per band. */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    val bits = 64 / bands
    val fp = df.select(col(idCol).as("id"),
      simhash64(TextStats.tokens(col(textCol))).as("sh"))
    val banded = fp.select(col("id"), col("sh"), posexplode(
      array((0 until bands).map { b =>
        shiftrightunsigned(col("sh"), b * bits).bitwiseAND(lit((1L << bits) - 1))
      }: _*)).as(Seq("band", "band_bits")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_bits") === col("b.band_bits") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-dup in the exact integer domain: vectors
    * quantized to 1e-3, pairs kept when dot > 0 and
    * 10^4·dot² > (t·10^2)²·|a|²·|b|² — algebraically identical to
    * cosine > t but free of float-comparison nondeterminism (the
    * SQL-oracle-safe form; the float kernel [[graft.functions.VectorKernels]]
    * is the production scorer). */
  def cosineNearDupQuantized(emb: DataFrame, idCol: String, vecCol: String,
                             threshold: Double): DataFrame = {
    val q = emb.select(col(idCol).as("id"),
      transform(col(vecCol),
        x => round(x.cast("double") * 1000).cast("long")).as("qv"))
    val withNorm = q.withColumn("norm2",
      aggregate(col("qv"), lit(0L), (acc, v) => acc + v * v))
    val tScaled = math.round(threshold * 100) // t*100 as exact integer
    withNorm.as("a").join(withNorm.as("b"), col("a.id") < col("b.id"))
      .withColumn("dot",
        aggregate(zip_with(col("a.qv"), col("b.qv"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v))
      .where(col("dot") > 0 &&
        col("dot") * col("dot") * lit(10000L) >
          lit(tScaled * tScaled) * col("a.norm2") * col("b.norm2"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("dot"))
  }
}
