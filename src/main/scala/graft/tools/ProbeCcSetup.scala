package graft.tools

import graft.core.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Dev probe: decompose the cloned-session connectedComponents
  * invocation (q67's operator) into its cost terms — the round-12
  * isolation change moved the loop conf onto a `newSession()` clone
  * and q67 regressed 2.09 → 3.25 s at sf0.1 with the cause
  * unmeasured. Times, each over `reps` repetitions on a warm JVM:
  *   (a) newSession() + the two conf copies
  *   (b) rebase of the edge plan onto the clone + forcing analysis
  *       (the first rebase also pays the clone's lazy SessionState
  *       construction — analyzer, catalog, optimizer)
  *   (c) the full connectedComponents invocation (driverThreshold=0)
  *   (d) the q67 consumer aggregate over the labels
  */
object ProbeCcSetup {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val s = Sessions.build("probe-cc-setup")
    // job timeline: duration of each job + the driver-side gap before
    // it (query compilation, checkpoint bookkeeping, conf churn)
    val lastEnd = new java.util.concurrent.atomic.AtomicLong(0L)
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val prev = lastEnd.get()
        val gap = if (prev == 0L) 0L else j.time - prev
        starts(j.jobId) = j.time
        println(f"    job ${j.jobId}%3d start (driver gap ${gap}%5d ms)")
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        lastEnd.set(j.time)
        val dur = starts.get(j.jobId).map(st => j.time - st).getOrElse(-1L)
        println(f"    job ${j.jobId}%3d end   (ran        ${dur}%5d ms)")
      }
    })
    val keys = Tables.orders(s, dir).select(col("o_orderkey").cast("long").as("k"))
    val edges = keys.where(col("k") % 4 =!= 0)
      .select(col("k").as("src"), (col("k") - 1).as("dst"))

    def time[T](what: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $what%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // warm: codegen/JIT + parquet footer caches
    graft.llm.Dedup.connectedComponents(edges, driverThreshold = 0).count()
    s.catalog.clearCache(); System.gc(); Thread.sleep(300)

    (1 to reps).foreach { i =>
      println(s"rep $i:")
      val sess = time("newSession + conf copies") {
        val c = s.newSession()
        c.conf.set("spark.sql.adaptive.enabled", "false")
        c.conf.set("spark.sql.shuffle.partitions",
          s.conf.get("spark.sql.shuffle.partitions"))
        c
      }
      time("rebase edges onto clone + analyze") {
        org.apache.spark.sql.GraftSqlBridge.rebase(sess, edges)
          .queryExecution.analyzed
      }
      val labels = time("connectedComponents (full)") {
        graft.llm.Dedup.connectedComponents(edges, driverThreshold = 0)
      }
      time("consumer aggregate + collect") {
        labels.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("n_nodes"), max(col("id")).as("max_id"))
          .orderBy(col("cluster_id")).collect()
      }
      s.catalog.clearCache()
    }
    s.stop()
  }
}
