package graft.tools

import graft.core.Sessions

/** Dev probe (r18): SAME-JVM interleaved A/B of registered queries
  * with the scan-rebalance on vs off — the only comparison that
  * survives this sandbox's ambient-throughput drift (cross-JVM runs
  * minutes apart moved 30-40% with zero code change). Runs each
  * picked query alternating conf off/on, N rounds, prints per-round
  * and min times.
  * Usage: runMain graft.tools.ProbeAB <sfDir> <rounds> <query>...
  */
object ProbeAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val picks = args.drop(2)
    val s = Sessions.build("probe-ab")
    val qs = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => picks.exists(n.contains))
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(s, dir)
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      s.catalog.clearCache(); System.gc()
      sec
    }
    // warmups, one per mode per query
    qs.foreach { q =>
      s.conf.set("spark.graft.scanRebalance", "off"); run(q)
      s.conf.set("spark.graft.scanRebalance", "auto"); run(q)
    }
    val res = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    (1 to rounds).foreach { r =>
      qs.foreach { q =>
        Seq("off", "auto").foreach { mode =>
          s.conf.set("spark.graft.scanRebalance", mode)
          s.sparkContext.setJobDescription(s"$q[$mode] r$r")
          val sec = run(q)
          res((q, mode)) = res((q, mode)) :+ sec
          println(f"ROUND $r $q%-36s $mode%-5s $sec%7.2f s")
        }
      }
    }
    qs.foreach { q =>
      val off = res((q, "off")); val on = res((q, "auto"))
      println(f"MIN   $q%-36s off ${off.min}%6.2f  auto ${on.min}%6.2f  " +
        f"speedup ${off.min / on.min}%5.2fx")
    }
    s.stop()
  }
}
