package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev probe: stage-by-stage timing of the q30 MinHash pipeline. */
object ProbeQ30 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.build("probe-q30")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val d = Tables.documents(spark, sfDir)
    timed("docs count")(d.count())
    val sh = d.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 2).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("shingle cache")(sh.count())
    val (bands, rows) = (16, 4)
    val numHashes = bands * rows
    val sig = sh.select(col("id"), explode(col("sh")).as("s"))
      .groupBy(col("id"))
      .agg(min(xxhash64(lit(0), col("s"))).as("mh0"),
        (1 until numHashes).map(j =>
          min(xxhash64(lit(j), col("s"))).as(s"mh$j")): _*)
    val banded = sig.select(col("id"), posexplode(
        array((0 until bands).map { b =>
          xxhash64((lit(b) +: (0 until rows).map(r =>
            col(s"mh${b * rows + r}"))): _*)
        }: _*)).as(Seq("band", "band_hash")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("banded cache")(banded.count())
    val capped = banded.withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_hash"))))
      .where(col("bucket_n") <= 500).drop("bucket_n")
    val cands = capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    timed("capped only")(capped.count())
    val nc = timed("candidates")(cands.count())
    timed("candidates 2nd run")(cands.count())
    println(s"candidates: $nc")
    val verified = cands
      .join(sh.as("sa"), col("id_a") === col("sa.id"))
      .join(sh.as("sb"), col("id_b") === col("sb.id"))
      .withColumn("n_inter", size(array_intersect(col("sa.sh"), col("sb.sh"))))
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") /
          (size(col("sa.sh")) + size(col("sb.sh")) - col("n_inter"))).as("jaccard"))
      .where(col("jaccard") >= 0.8)
    val nv = timed("verified")(verified.count())
    println(s"verified: $nv")
    spark.stop()
  }
}
