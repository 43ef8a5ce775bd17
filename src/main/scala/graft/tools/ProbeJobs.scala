package graft.tools

import graft.core.Sessions
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.concurrent.TrieMap

/** Dev probe: per-Spark-job wall time for one SparkEntry query, to see
  * where a multi-stage action's seconds actually go (AQE splits one
  * action into many jobs; the per-job scheduler floor adds up).
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("q40_ads_travel_time_pipeline")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.build("probe-jobs")
    val starts = TrieMap[Int, (Long, String)]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val stages = j.stageInfos.map(si =>
          s"${si.name.takeWhile(_ != '(').trim}[${si.numTasks}]").mkString(" ")
        starts(j.jobId) = (System.nanoTime(), stages)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          println(f"JOB ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
        }
    })
    val q = graft.SparkEntry.queries(qname)
    // noop-forced (count() lets the optimizer delete compute subtrees)
    def force(): Unit =
      q(s, dir).write.mode("overwrite").format("noop").save()
    // warm run (codegen/JIT), then the timed profile run
    force(); s.catalog.clearCache(); System.gc()
    println("=== timed run ===")
    val t0 = System.nanoTime()
    force()
    Thread.sleep(500)
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    s.stop()
  }
}
