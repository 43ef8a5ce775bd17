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
      val names = graft.SparkEntry.queries.keys.toSeq.sorted
      // exact name wins; otherwise a UNIQUE substring match; ambiguous
      // or unknown names fail loudly instead of timing the wrong query
      val q = names.find(_ == name).getOrElse {
        val hits = names.filter(_.contains(name))
        require(hits.size == 1,
          s"'$name' matches ${hits.size} queries: ${hits.take(5).mkString(", ")}")
        hits.head
      }
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(s, dir)
        .write.mode("overwrite").format("noop").save()
      println(f"PROBEONCE $q ${(System.nanoTime() - t0) / 1e9}%.1f s")
      s.catalog.clearCache(); System.gc()
    }
    s.stop()
  }
}
