package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev experiment for the q98 store layout: can a SORTED band-index
  * store with small parquet pages turn the per-arrival hot-bucket
  * restriction from a full column scan into a page-pruned read?
  *
  * The pruning math: a probe of H hot keys against a store whose sort
  * column is split into P page ranges reads only pages containing a
  * key — expected pages hit ≈ P·(1-(1-1/P)^H) ≈ H for P ≫ H. With
  * default 1MB pages P is a few hundred at 80M rows (every page hit);
  * with ~8-16KB pages P ≈ 10^5 and the read is bounded by H, i.e.
  * BATCH-sized, flat in corpus. This probe measures: full scan, scan
  * with a literal IN filter on the default-page store, and the same on
  * a sorted small-page store — plus the broadcast-semi-join baseline.
  */
object ProbeQ98Store {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf10")
    val mod = sys.env.getOrElse("SPARK_GRAFT_BATCH_MOD", "1000").toLong
    val s = Sessions.build("probe-q98store")
    s.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "100000")
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-32s $sec%8.2f s"); sec
    }
    val d = Tables.documents(s, dir)
    val isBatch = pmod(xxhash64(col("doc_id")), lit(mod)) === 7
    val batch = d.where(isBatch).select(col("doc_id"), col("text"))
    val corpus = d.where(!isBatch)
    println(s"corpus=${corpus.count()} batch=${batch.count()} dir=$dir")

    val root = java.nio.file.Files.createTempDirectory("graft_q98store")
    try {
      val idx = Dedup.minhashBandIndex(corpus, "doc_id", "text")
      t("write: default layout") {
        idx.write.parquet(s"$root/idx_plain")
      }
      t("write: sorted 16KB pages") {
        idx.repartitionByRange(32, col("band_hash"))
          .sortWithinPartitions("band_hash")
          .write
          .option("parquet.page.size", "16384")
          .option("parquet.page.row.count.limit", "2000")
          .parquet(s"$root/idx_sorted")
      }
      // hot keys of one arrival, collected (batch-bounded: |batch|*bands)
      val newSh = batch.select(col("doc_id").cast("long").as("id"),
        Dedup.shingles(col("text"), 2).as("sh"))
      val hotRows = Dedup.bandedSignatures(newSh, 16, 4)
        .select(col("band_hash")).distinct().collect()
      val hot: Array[Long] = hotRows.map(_.getLong(0))
      println(s"hot keys: ${hot.length}")

      val plain = s.read.parquet(s"$root/idx_plain")
      val sorted = s.read.parquet(s"$root/idx_sorted")
      t("scan: full (plain)") { noop(plain) }
      // NOTE round-11 finding: pushing the full hot set as literals
      // (inFilterThreshold raised past |hot|) explodes: Spark or-chains
      // the IN for the parquet filter and parquet-mr's recursive filter
      // evaluation StackOverflows at ~8k terms. A 500-term IN (the fp
      // store's shape) survives but prunes nothing (see the pruning
      // math above: hot keys >> page count at these decades). Kept here
      // as the measured record; the production path is the broadcast
      // semi-join below.
      t("scan: IN-filtered 500 (sorted)") {
        noop(sorted.where(col("band_hash")
          .isin(hot.take(500).map(Long.box): _*)))
      }
      t("hot-set compute alone") {
        noop(Dedup.bandedSignatures(newSh, 16, 4)
          .select(col("band"), col("band_hash")).distinct())
      }
      // hot set as a LOCAL relation (the collected keys) — pure join cost
      import s.implicits._
      val hotLocal = Dedup.bandedSignatures(newSh, 16, 4)
        .select(col("band"), col("band_hash")).distinct()
        .as[(Int, Long)].collect().toSeq.toDF("band", "band_hash")
      t("semi-join vs local hot (plain)") {
        noop(plain.join(broadcast(hotLocal), Seq("band", "band_hash"),
          "left_semi"))
      }
      t("semi-join vs local hot (sorted)") {
        noop(sorted.join(broadcast(hotLocal), Seq("band", "band_hash"),
          "left_semi"))
      }
      t("semi-join vs computed hot (plain)") {
        val hotDf = Dedup.bandedSignatures(newSh, 16, 4)
          .select(col("band"), col("band_hash")).distinct()
        noop(plain.join(broadcast(hotDf), Seq("band", "band_hash"),
          "left_semi"))
      }
      // sanity: both layouts agree under the semi-join
      val a = plain.join(broadcast(hotLocal), Seq("band", "band_hash"),
        "left_semi").count()
      val b = sorted.join(broadcast(hotLocal), Seq("band", "band_hash"),
        "left_semi").count()
      println(s"semi rows plain=$a sorted=$b")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
    s.stop()
  }
}
