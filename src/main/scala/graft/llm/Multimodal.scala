package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads as opaque `binary` columns with typed metadata, batched
  * decode / feature-extraction / resize / frame-sampling stages.
  *
  * The actual codecs are NOT in this container, so the decode kernels
  * are STUBS — deterministic fakes clearly marked below. Everything
  * around them is real and load-bearing: the schema contract, the
  * `mapPartitions` batching shape (the Scala twin of PySpark's
  * `mapInPandas` — one iterator per partition, amortized per-batch
  * setup), and the partitioning strategy (media rows are fat, so
  * repartition by byte budget, not row count, before decode).
  */
object Multimodal {

  /** One media object: payload plus source metadata. */
  final case class MediaRow(media_id: Long, kind: String,
                            payload: Array[Byte], source: String)

  /** Decoded/extracted features (fixed schema regardless of kind). */
  final case class MediaFeatures(media_id: Long, kind: String,
                                 byte_len: Int, width: Int, height: Int,
                                 n_frames: Int, feature_hash: Long)

  /** Wrap any table with a binary payload column into the media
    * contract (here text bytes stand in for image/audio/video bytes). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   kindCol: org.apache.spark.sql.Column,
                   sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      kindCol.as("kind"),
      col(payloadCol).cast("binary").as("payload"),
      col(sourceCol).as("source"))

  /** Rows-per-partition sizing by byte budget: media rows are orders of
    * magnitude fatter than tabular rows; partition count must track
    * Σbytes/budget or executors OOM at scale. */
  def repartitionByBytes(df: DataFrame, approxTotalBytes: Long,
                         budgetPerPartition: Long = 128L << 20): DataFrame =
    df.repartition(math.max(1, (approxTotalBytes / budgetPerPartition).toInt))

  // ---- STUB KERNELS ----------------------------------------------------
  // Real implementations would call an image/audio codec here (e.g.
  // javax.imageio / ffmpeg bindings). None are installed in this
  // container, so these produce deterministic fakes derived from the
  // payload bytes; signatures and batch shape are the real contract.

  /** STUB decode: "parses" payload headers. Deterministic: dimensions
    * derived from a byte hash. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(payload.length, 256)) { h = 31 * h + payload(i); i += 1 }
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >> 10, 1024).toInt
    val frames = 1 + math.floorMod(h >> 20, 32).toInt
    (w, ht, frames)
  }

  /** STUB feature hash: stands in for an embedding/perceptual hash. */
  private def featureHashStub(payload: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    payload.foreach { b => h ^= (b & 0xFFL); h *= 0x100000001B3L }
    h
  }
  // ---------------------------------------------------------------------

  /** Batched decode + feature extraction: `mapPartitions` so per-batch
    * decoder setup is paid once per partition, not per row (the
    * `mapInPandas` execution shape in Scala). */
  def decodeAndExtract(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition decoder init would go here (once, not per row)
      it.map { m =>
        val (w, h, frames) = decodeStub(m.payload)
        MediaFeatures(m.media_id, m.kind, m.payload.length, w, h,
          if (m.kind == "video") frames else 1,
          featureHashStub(m.payload))
      }
    }
  }

  /** STUB resize: emits the target dims (a real kernel returns resized
    * bytes); keeps the (payload in → payload out) signature. */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame =
    media.withColumn("resized_payload", col("payload"))
      .withColumn("target_w", lit(targetW))
      .withColumn("target_h", lit(targetH))

  /** Frame sampling for video rows: every `stride`-th frame index up to
    * the decoded frame count — generates (media_id, frame_no) rows; the
    * stub "samples" indexes only, a real kernel would emit frame bytes. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.filter(_.kind == "video")
      .flatMap(f => (0 until f.n_frames by stride)
        .map(i => (f.media_id, i, f.n_frames)))
      .toDF("media_id", "frame_no", "n_frames")
  }
}
