package graft.tools

import graft.core.Sessions

/** Dev probe: ONE noop-forced execution of each named query (no
  * warmups) — for multi-minute scale measurements where the Bench
  * protocol's five executions per query are prohibitive and JIT noise
  * is negligible relative to the runtime. */
object ProbeOnce {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.build("probe-once")
    args.foreach { name =>
      val q = graft.SparkEntry.queries.keys.find(_.contains(name)).get
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(s, dir)
        .write.mode("overwrite").format("noop").save()
      println(f"PROBEONCE $q ${(System.nanoTime() - t0) / 1e9}%.1f s")
      s.catalog.clearCache(); System.gc()
    }
    s.stop()
  }
}
