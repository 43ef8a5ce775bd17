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
    * (id, gate_pass, exact_dup, near_dup, admitted). Computes the
    * seen fingerprints inline — the one-shot form. The service path
    * passes a PERSISTED fingerprint store instead
    * ([[auditWithFps]]): recomputing md5 over the whole seen corpus
    * per arriving batch is an O(corpus)-per-batch term the stored
    * artifact exists to avoid. */
  def audit(seen: DataFrame, batch: DataFrame, idCol: String,
            textCol: String, index: DataFrame,
            threshold: Double = 0.8): DataFrame =
    auditWithFps(seen, batch, idCol, textCol, index,
      seen.select(TextStats.fingerprint(col(textCol)).as("fp")),
      threshold)

  /** [[audit]] with the seen fingerprints supplied as a table (column
    * `fp`; duplicates fine — membership is a semi-join). `seen` texts
    * are still needed by the probe's candidate verification, but are
    * read ONLY for hot-bucket candidates (semi-join-restricted), never
    * fingerprint-scanned. */
  def auditWithFps(seen: DataFrame, batch: DataFrame, idCol: String,
                   textCol: String, index: DataFrame, fps: DataFrame,
                   threshold: Double = 0.8): DataFrame = {
    val gated = Quality.scored(
        batch.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col(textCol), col("quality_kept").as("gate_pass"))
    val store = fps.select(col("fp")).distinct()
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
    * `seenDir`, band index under `indexDir`, fingerprints under
    * `fpsDir`), write the audit rows under `auditDir`, then write the
    * batch's own doc, banded, and fingerprint rows into the stores —
    * the incremental-append law pinned in LlmSpec (index(a ∪ b) ==
    * index(a) ∪ index(b), per-doc purity), so the store after N
    * micro-batches equals a from-scratch rebuild. The fingerprint
    * store is what keeps exact-dup O(batch) per arrival: without it
    * every micro-batch would md5-scan the whole seen corpus again.
    *
    * REPLAY-SAFE: Structured Streaming replays a micro-batch after a
    * crash, and `foreachBatch` leaves idempotence to the body — a
    * plain append would duplicate every row the first attempt already
    * landed. Each write therefore goes to a `mb_<batchId>` SUBDIR in
    * OVERWRITE mode: a replay rewrites the same four subdirs and the
    * union over subdirs is unchanged. Readers (this method and any
    * consumer) list one level of subdirs (via the store's Hadoop
    * FileSystem, so HDFS/S3 stores work the same as local paths) and
    * read them with recursiveFileLookup. Seed each store by writing
    * the initial corpus under a subdir of its own (e.g. `mb_init`).
    *
    * Everything is engine-side parquet I/O: no driver materialization
    * of any corpus-sized set. The audit write is an action, so the
    * audit is fully computed BEFORE the stores mutate (a batch never
    * pairs with its own appended copy — and on replay, where the
    * batch's own rows from the first attempt ARE already in the
    * stores, the audit must not see them: subdir isolation makes the
    * exclusion explicit by reading everything EXCEPT this batchId's
    * subdirs).
    *
    * Equality contract, stated exactly: with ids monotone ACROSS
    * micro-batches, the cumulative audits equal the one-shot [[audit]]
    * of the concatenated batch (spec-pinned incl. a kill-resume)
    * PROVIDED no LSH bucket crosses `maxBucketSize` between the
    * per-batch and one-shot runs — the probe's cap counts bucket
    * members as of each call, so a bucket that fills DURING the
    * arrival sequence can flag pairs a one-shot run (seeing the full
    * bucket at once) would have dropped, and vice versa. Below the
    * cap the two are identical; within a micro-batch order never
    * matters. */
  def processMicroBatch(batch: DataFrame, batchId: Long,
                        idCol: String, textCol: String,
                        seenDir: String, indexDir: String, fpsDir: String,
                        auditDir: String,
                        threshold: Double = 0.8): Unit = {
    val s = batch.sparkSession
    def readExceptSelf(root: String): DataFrame = {
      val path = new org.apache.hadoop.fs.Path(root)
      val fs = path.getFileSystem(s.sessionState.newHadoopConf())
      val keep = fs.listStatus(path)
        .filter(st => st.isDirectory &&
          st.getPath.getName != s"mb_$batchId")
        .map(_.getPath.toString)
      require(keep.nonEmpty, s"no seeded store under $root (write the " +
        "initial corpus under a subdir, e.g. mb_init)")
      s.read.option("recursiveFileLookup", "true").parquet(keep.toSeq: _*)
    }
    val seen = readExceptSelf(seenDir)
    val index = readExceptSelf(indexDir)
    val fps = readExceptSelf(fpsDir)
    auditWithFps(seen, batch, idCol, textCol, index, fps, threshold)
      .write.mode("overwrite").parquet(s"$auditDir/mb_$batchId")
    batch.select(col(idCol), col(textCol))
      .write.mode("overwrite").parquet(s"$seenDir/mb_$batchId")
    Dedup.minhashBandIndex(batch, idCol, textCol)
      .write.mode("overwrite").parquet(s"$indexDir/mb_$batchId")
    batch.select(TextStats.fingerprint(col(textCol)).as("fp"))
      .write.mode("overwrite").parquet(s"$fpsDir/mb_$batchId")
  }
}
