package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.llm.Dedup

/** Dev probe (r18): A/B the scan-parallelism floor (Tables.loadFact
  * rebalance) against the bare single-split scan, on the operators the
  * rebalance was meant to speed up. Usage:
  * runMain graft.tools.ProbeRebal [sfDir]
  */
object ProbeRebal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Sessions.build("probe-rebal")
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Unit = {
      s.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); f
      println(f"STAGE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      s.catalog.clearCache()
    }
    val bare = Tables.load(s, dir, "documents")
    val rebal = Tables.documents(s, dir) // rebalanced via loadFact
    t("warmup bare")(noop(bare))
    println("bare scan partitions: " + bare.rdd.getNumPartitions)
    println("rebal partitions:     " + rebal.rdd.getNumPartitions)
    (1 to 3).foreach { i =>
      t(s"index build BARE  (run $i)") {
        noop(Dedup.minhashBandIndex(
          bare.where(col("doc_id") % 10 =!= 7), "doc_id", "text"))
      }
    }
    (1 to 3).foreach { i =>
      t(s"index build REBAL (run $i)") {
        noop(Dedup.minhashBandIndex(
          rebal.where(col("doc_id") % 10 =!= 7), "doc_id", "text"))
      }
    }
    // the raw shingle+explode+agg cost without banding
    def sigOnly(d: DataFrame): DataFrame =
      d.select(col("doc_id"), explode(Dedup.shingles(col("text"), 2)).as("sh"))
        .select(col("doc_id"), xxhash64(lit(0), col("sh")).as("h"))
        .groupBy(col("doc_id")).agg(min(col("h")).as("m"))
    (1 to 3).foreach { i => t(s"sig1 BARE  (run $i)")(noop(sigOnly(bare))) }
    (1 to 3).foreach { i => t(s"sig1 REBAL (run $i)")(noop(sigOnly(rebal))) }
    s.stop()
  }
}
