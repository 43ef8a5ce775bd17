package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import graft.core.Sessions
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Dev probe: distributed CC wall time on a DENSE clique-family graph
  * — the q101 image/audio pair shape (N/100 families, each an
  * all-pairs clique of width 100 → ~N·99/2 edges). Backs the SCALE.md
  * analysis of where the 181 s CC pass at 24.8M edges goes: per-round
  * job boundaries are printed with task counts and wall offsets so the
  * expensive stage is identifiable by eye. */
object ProbeCcDense {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_DOCS", "500000").toLong
    val width = sys.env.getOrElse("SPARK_GRAFT_WIDTH", "100").toInt
    val s = Sessions.build("probe-cc-dense")
    val t0 = System.nanoTime()
    val jobs = new AtomicInteger(0)
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val stages = j.stageInfos.map(si =>
          s"${si.stageId}[${si.numTasks}]").mkString(" ")
        println(f"  t=${(System.nanoTime() - t0) / 1e9}%7.2f job ${j.jobId} $stages")
      }
    })
    // all-pairs edges within each width-sized id family
    val ids = s.range(nDocs).select(col("id"))
    val fam = ids.select(col("id"),
      (col("id") / width).cast("long").as("f"), pmod(col("id"), lit(width.toLong)).as("o"))
    val edges = fam.as("a").join(fam.as("b"),
        col("a.f") === col("b.f") && col("a.o") < col("b.o"))
      .select(col("a.id").as("src"), col("b.id").as("dst"))
    val cached = graft.core.Caching.eager(edges)
    println(s"edges: ${cached.count()} (docs=$nDocs width=$width)")
    val t1 = System.nanoTime()
    val labels = graft.llm.Dedup.connectedComponents(cached,
      driverThreshold = 0)
    val n = labels.select(countDistinct(col("cluster_id"))).collect()(0).getLong(0)
    println(f"CC wall ${(System.nanoTime() - t1) / 1e9}%.2f s, " +
      s"components $n (expect ${(nDocs + width - 1) / width})")
    s.stop()
  }
}
