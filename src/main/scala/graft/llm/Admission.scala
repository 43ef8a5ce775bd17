package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental corpus admission — the per-document decision a growing
  * corpus makes on arrival (the library form of q98; see
  * `queries/LlmPipelines.q98` for the oracle-checked registration):
  * learned quality gate ([[Quality.scored]], map-side) → exact-dup
  * against the seen corpus's fingerprints (semi-join; intra-batch
  * first-keeper via a BATCH-sized min-window) → near-dup against the
  * corpus's persisted band index ([[Dedup.minhashProbePairs]]: corpus
  * signatures never recompute, only batch-hit buckets shuffle) →
  * admitted iff all three clear.
  *
  * The near-dup rule is the conservative monotone one: a batch doc is
  * flagged if it pairs with ANY seen doc or any smaller-id batch doc,
  * regardless of that partner's own admission — order-independent
  * within a batch, so the audit replays identically under any arrival
  * interleaving of a batch's contents. */
object Admission {

  /** The per-doc audit table for one arriving batch against a frozen
    * `seen` corpus (id + text) and its band `index`
    * ([[Dedup.minhashBandIndex]] rows over exactly `seen`):
    * (id, gate_pass, exact_dup, near_dup, admitted). */
  def audit(seen: DataFrame, batch: DataFrame, idCol: String,
            textCol: String, index: DataFrame,
            threshold: Double = 0.8): DataFrame = {
    val gated = Quality.scored(
        batch.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col(textCol), col("quality_kept").as("gate_pass"))
    val store = seen
      .select(TextStats.fingerprint(col(textCol)).as("fp")).distinct()
    val wFp = Window.partitionBy(col("fp"))
    val exact = gated
      .withColumn("fp", TextStats.fingerprint(col(textCol)))
      .join(store.withColumn("__in_seen", lit(true)), Seq("fp"), "left")
      .withColumn("exact_dup",
        coalesce(col("__in_seen"), lit(false)) ||
          col(idCol) > min(col(idCol)).over(wFp))
    val pairs = Dedup.minhashProbePairs(seen, batch, idCol, textCol,
      index, threshold)
    val batchIds = batch.select(col(idCol).cast("long").as("__bid"))
    val touches = pairs.select(col("id_a").as("d"), col("id_b").as("o"))
      .union(pairs.select(col("id_b").as("d"), col("id_a").as("o")))
      .join(batchIds, col("d") === col("__bid"), "left_semi")
    val ndFlag = touches
      .join(batchIds.withColumn("__in_batch", lit(true)),
        col("o") === col("__bid"), "left")
      .where(!coalesce(col("__in_batch"), lit(false)) || col("o") < col("d"))
      .select(col("d")).distinct()
      .withColumn("__nd", lit(true))
    exact
      .join(ndFlag, col(idCol) === col("d"), "left")
      .withColumn("near_dup", coalesce(col("__nd"), lit(false)))
      .withColumn("admitted",
        col("gate_pass") && !col("exact_dup") && !col("near_dup"))
      .select(col(idCol), col("gate_pass"), col("exact_dup"),
        col("near_dup"), col("admitted"))
  }

  /** ONE micro-batch step of the streaming admission service — the
    * `foreachBatch` body of the continuous twin: audit the arriving
    * batch against the PERSISTED artifacts (seen-docs parquet under
    * `seenDir`, band index under `indexDir`), write the audit rows
    * under `auditDir`, then write the batch's own doc rows and banded
    * rows into the stores — the incremental-append law pinned in
    * LlmSpec (index(a ∪ b) == index(a) ∪ index(b), per-doc purity),
    * so the store after N micro-batches equals a from-scratch rebuild.
    *
    * REPLAY-SAFE: Structured Streaming replays a micro-batch after a
    * crash, and `foreachBatch` leaves idempotence to the body — a
    * plain append would duplicate every row the first attempt already
    * landed. Each write therefore goes to a `mb_<batchId>` SUBDIR in
    * OVERWRITE mode: a replay rewrites the same three subdirs and the
    * union over subdirs is unchanged. Readers (this method and any
    * consumer) list one level of subdirs via recursiveFileLookup.
    * Seed the stores by writing the initial corpus under a subdir of
    * its own (e.g. `mb_init`).
    *
    * Everything is engine-side parquet I/O: no driver materialization
    * of any corpus-sized set. The audit write is an action, so the
    * audit is fully computed BEFORE the stores mutate (a batch never
    * pairs with its own appended copy — and on replay, where the
    * batch's own rows from the first attempt ARE already in the
    * stores, the audit must not see them: subdir isolation makes the
    * exclusion explicit by reading everything EXCEPT this batchId's
    * subdirs). Arrival contract: ids monotone ACROSS micro-batches
    * make the cumulative audits equal the one-shot [[audit]] of the
    * concatenated batch (spec-pinned); within a micro-batch order
    * never matters. */
  def processMicroBatch(batch: DataFrame, batchId: Long,
                        idCol: String, textCol: String,
                        seenDir: String, indexDir: String, auditDir: String,
                        threshold: Double = 0.8): Unit = {
    val s = batch.sparkSession
    def readExceptSelf(root: String): DataFrame = {
      val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(root))
        .iterator()
      val keep = scala.collection.mutable.ArrayBuffer.empty[String]
      while (dirs.hasNext) {
        val p = dirs.next()
        if (java.nio.file.Files.isDirectory(p) &&
            p.getFileName.toString != s"mb_$batchId")
          keep += p.toString
      }
      require(keep.nonEmpty, s"no seeded store under $root (write the " +
        "initial corpus under a subdir, e.g. mb_init)")
      s.read.option("recursiveFileLookup", "true").parquet(keep.toSeq: _*)
    }
    val seen = readExceptSelf(seenDir)
    val index = readExceptSelf(indexDir)
    audit(seen, batch, idCol, textCol, index, threshold)
      .write.mode("overwrite").parquet(s"$auditDir/mb_$batchId")
    batch.select(col(idCol), col(textCol))
      .write.mode("overwrite").parquet(s"$seenDir/mb_$batchId")
    Dedup.minhashBandIndex(batch, idCol, textCol)
      .write.mode("overwrite").parquet(s"$indexDir/mb_$batchId")
  }
}
