package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}

/** Dev probe (SCALE.md round-10): the q14 decade record. Times the
  * registered two-phase exact+HLL form against the PURE-SKETCH form a
  * 100 TB deployment would run (one aggregation, `approx_count_distinct`
  * only — no exact twin, no distinct pre-aggregation, the per-group
  * state a fixed 1%-rsd HLL++ sketch), warm min-of-3 under noop
  * forcing, on one scale dir per arg. */
object ProbeQ14 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/testdata-sf1",
        "/root/repo/testdata-sf10")
    val s = Sessions.build("probe-q14")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time3(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      noop(f)
      val ts = (1 to 3).map { _ =>
        s.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBEQ14 $label%-34s min ${ts.min}%6.3f s (${ts.map(t => f"$t%.3f").mkString(", ")})")
    }
    dirs.foreach { dir =>
      def registered() = graft.SparkEntry.queries("q14_hll_distinct")(s, dir)
      def pureHll() = Tables.events(s, dir)
        .where(col("user_id").isNotNull)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
        .orderBy(col("event_type"))
      time3(s"$dir two-phase exact+hll")(registered())
      time3(s"$dir pure-hll")(pureHll())
    }
    s.stop()
  }
}
