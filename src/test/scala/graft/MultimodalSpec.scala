package graft

import graft.llm.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing (q36's hard signal — the query is rows-only in
  * CORRECTNESS): schema contract, stub-decoder determinism, frame
  * sampling arithmetic, and the q36 aggregate against a driver-side
  * recomputation from the feature rows.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("BMP and WAV headers are decoded for real (not stubbed)") {
    // minimal BMP: 'BM' magic, width=640 @18, height=-480 @22 (top-down)
    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'
    def putLe(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
      b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    putLe(bmp, 18, 640); putLe(bmp, 22, -480)
    assert(Multimodal.decodeBmp(bmp).contains((640, 480)))
    assert(Multimodal.decodeBmp("not a bmp".getBytes).isEmpty)
    // minimal WAV: RIFF/WAVE, 2ch @22, 44100 Hz @24, blockAlign 4 @32,
    // 44-byte header + 400 data bytes -> 100 frames
    val wav = new Array[Byte](44 + 400)
    "RIFF".getBytes.copyToArray(wav, 0); "WAVE".getBytes.copyToArray(wav, 8)
    wav(22) = 2; putLe(wav, 24, 44100); wav(32) = 4
    assert(Multimodal.decodeWav(wav).contains((2, 44100, 100)))
    // dispatch: real parse for magic payloads, stub fallback otherwise;
    // the wavParsed flag is how the hot path learns which kernel ran
    assert(Multimodal.decode(bmp) == Multimodal.Decoded(640, 480, 1, wavParsed = false))
    assert(Multimodal.decode(wav) == Multimodal.Decoded(2, 44100, 100, wavParsed = true))
    val stubbed = Multimodal.decode("zzz".getBytes)
    assert(stubbed.width >= 64 && !stubbed.wavParsed) // stub range
  }

  test("decodeAndExtract is deterministic and byte_len is exact") {
    val media = Seq(
      (1L, "image", "payload-one", "src"),
      (2L, "video", "payload-two-longer", "src"),
      (3L, "image", "payload-one", "src")) // same payload as 1
      .toDF("media_id", "kind", "payload_str", "source")
    val m = Multimodal.asMediaTable(media, "media_id", "payload_str",
      kindCol = col("kind"), sourceCol = "source")
    val feats = Multimodal.decodeAndExtract(m).collect().sortBy(_.media_id)
    assert(feats.map(_.byte_len).toSeq ==
      Seq("payload-one".length, "payload-two-longer".length, "payload-one".length))
    // identical payloads → identical decoded dims + feature hash
    assert(feats(0).width == feats(2).width &&
      feats(0).feature_hash == feats(2).feature_hash)
    // images are single-frame; audio keeps frames only from a REAL WAV
    // header parse (these text-byte payloads are not RIFF, so 1)
    assert(feats(0).n_frames == 1 && feats(1).n_frames >= 1)
  }

  test("sampleFrames emits every stride-th index for video rows only") {
    val media = Seq((1L, "video", "vvv", "s"), (2L, "image", "iii", "s"))
      .toDF("media_id", "kind", "p", "source")
    val feats = Multimodal.decodeAndExtract(
      Multimodal.asMediaTable(media, "media_id", "p", col("kind"), "source"))
    val nFrames = feats.collect().find(_.media_id == 1L).get.n_frames
    val sampled = Multimodal.sampleFrames(feats, stride = 4)
      .select($"media_id", $"frame_no").as[(Long, Int)].collect()
    assert(sampled.forall(_._1 == 1L), "only video rows sampled")
    assert(sampled.map(_._2).sorted.toSeq == (0 until nFrames by 4).toSeq)
  }

  test("q36 aggregate equals a driver-side recomputation") {
    val got = graft.SparkEntry.queries("q36_multimodal_features")(spark, SparkTestBase.sf)
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    val docs = graft.core.Tables.documents(spark, SparkTestBase.sf)
    val media = Multimodal.syntheticMediaTable(docs, "doc_id", "source")
    val feats = Multimodal.decodeAndExtract(media).collect()
    val want = feats.groupBy(_.kind).map { case (k, g) =>
      val sampled = g.filter(_.kind == "video")
        .map(f => (0 until f.n_frames by 4).size.toLong).sum
      (k, g.length.toLong, g.map(_.byte_len.toLong).sum,
        g.map(_.width.toDouble).sum / g.length, sampled)
    }.toSeq.sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3, r._5)) ==
      want.map(r => (r._1, r._2, r._3, r._5)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._4 - w._4) < 1e-9, s"avg_width ${g._1}") }
  }
}
