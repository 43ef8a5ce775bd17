package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import graft.core.{Sessions, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Dev probe: Spark-job count of the distributed connected-components
  * loop ALONE (setup + rounds, excluding the consumer aggregate), to
  * back SCALE.md's per-round job claim with a measured number. */
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // chain-block modulus: 4 → depth-3 chains (2 loop rounds), 16 →
    // depth-15 chains (4 rounds) — the job-count difference between
    // the two divided by the round difference is the jobs-per-round
    val mod = args.headOption.map(_.toInt).getOrElse(4)
    val s = Sessions.build("probe-cc")
    val jobs = new AtomicInteger(0)
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val stages = j.stageInfos.map(si =>
          s"${si.stageId}:${si.name.takeWhile(_ != '(').trim}[${si.numTasks}]")
        println(s"  job ${j.jobId} stages=${stages.mkString(" ")}")
      }
    })
    val keys = Tables.orders(s, dir).select(col("o_orderkey").cast("long").as("k"))
    val edges = keys.where(col("k") % mod =!= 0)
      .select(col("k").as("src"), (col("k") - 1).as("dst"))
    // warm (codegen/JIT), then count jobs of the timed pass
    graft.llm.Dedup.connectedComponents(edges, driverThreshold = 0).count()
    s.catalog.clearCache(); System.gc()
    Thread.sleep(300)
    val before = jobs.get()
    val t0 = System.nanoTime()
    val labels = graft.llm.Dedup.connectedComponents(edges, driverThreshold = 0)
    Thread.sleep(300) // drain the async listener bus before the snapshot
    val afterLoop = jobs.get()
    val n = labels.count() // checkpointed output: this is 1 trivial job
    Thread.sleep(300)
    println(f"CC loop jobs: ${afterLoop - before} (+${jobs.get() - afterLoop} to count $n rows), " +
      f"wall ${(System.nanoTime() - t0) / 1e9}%.3f s")
    s.stop()
  }
}
