package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + balanced shard assignment — the
  * training-order step every LLM data pipeline ends with (the
  * WebDataset/Megatron "shuffle then shard" contract): every document
  * gets a shard in [0, nShards) and a 1-based position inside that
  * shard, both pure functions of (id, seed), so the training order is
  * reproducible on any engine, any partitioning, any cluster size —
  * and a re-run with a new seed is a fresh permutation.
  *
  * Built on [[Sampling]]'s portable-arithmetic discipline (Knuth
  * multiplicative limb mixing, every intermediate < 2^63, exact ANSI
  * twin — engine-native hashes and `rand(seed)` do NOT
  * cross-reproduce): the seed enters as a third mixed limb, a second
  * mixing round decorrelates the order key from the shard key so the
  * within-shard order is not a function of the shard.
  *
  * Scale shape (100 TB): assignment is map-side; materializing
  * positions is ONE hash exchange on `shard` + a per-shard sort —
  * exactly the physical plan a shard writer needs anyway (each shard
  * written as one ordered file), with hash-uniform shard sizes
  * (doc-count balance spec-pinned) and nShards sized so a shard fits
  * an executor (10^4-10^5 shards at corpus scale; the window never
  * sees more than one shard per partition after the exchange).
  */
object Sharding {

  private val Knuth = 2654435761L
  private val Limb = 2147483647L
  private val M32 = 4294967296L

  /** The mixed 32-bit hash both keys derive from: id limbs and the
    * seed each multiply a distinct odd constant, folded mod 2^32.
    * ANSI twin (ids >= 0):
    * `((id % 2147483647) * 2654435761
    *   + ((id // 2147483647) % 2147483647) * 40503
    *   + seed * 97003) % 4294967296`. */
  private[graft] def mix(id: Column, seed: Long): Column = {
    val idL = id.cast("long")
    val guarded = when(idL < 0, raise_error(concat(
        lit("Sharding requires ids >= 0 (cross-engine order parity); got "),
        idL.cast("string"))))
      .otherwise(idL)
    val lo = pmod(guarded, lit(Limb))
    val hi = pmod(Cleaning.intDiv(guarded, lit(Limb)), lit(Limb))
    pmod(lo * Knuth + hi * 40503L + lit(seed * 97003L), lit(M32))
  }

  /** Second mixing round for the order key: decorrelates the
    * within-shard order from the shard assignment (h alone would make
    * position a near-function of shard residue). h < 2^32, so
    * h·69069 < 2^49 — overflow-safe. ANSI twin:
    * `(h * 69069 + id % 2147483647) % 4294967296`. */
  private def orderKey(h: Column, id: Column): Column =
    pmod(h * 69069L + pmod(id.cast("long"), lit(Limb)), lit(M32))

  /** Adds `shard` (in [0, nShards)) and `position` (1-based rank in
    * that shard's deterministic order; ties on the order key break by
    * id, so the TOTAL order is unique) to `df`. One exchange + one
    * per-shard sort; everything else map-side. */
  def assign(df: DataFrame, idCol: String, nShards: Int,
             seed: Long): DataFrame = {
    require(nShards >= 1 && nShards <= 1000000,
      s"nShards out of range: $nShards")
    require(seed >= 0 && seed < Limb, s"seed out of range: $seed")
    val h = mix(col(idCol), seed)
    val withKeys = df
      .withColumn("shard", pmod(h, lit(nShards.toLong)).cast("int"))
      .withColumn("__ok", orderKey(h, col(idCol)))
    withKeys
      .withColumn("position", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("__ok"), col(idCol))))
      .drop("__ok")
  }

  /** Write the corpus as one ordered parquet directory per shard
    * (`path/shard=K/`): the physical artifact a trainer streams. The
    * repartition keys the exchange on the SAME column the write
    * partitions by, so each shard lands in exactly one task and its
    * file holds the shard's rows in training order ([[assign]]'s
    * window already forced the per-shard sort; the sortWithinPartitions
    * here re-establishes it after the explicit repartition). */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, seed: Long,
                  path: String): Unit =
    assign(df, idCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("position"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
