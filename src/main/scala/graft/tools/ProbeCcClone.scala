package graft.tools

import graft.core.{Sessions, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dev probe: replicate ONE connectedComponents loop round — the
  * hop aggregate + fused pointer-jump self-join — rooted on (a) the
  * caller session with AQE flipped off save/restore style, vs (b) a
  * `newSession()` clone with the edge plan rebased, to isolate WHY the
  * round-12 cloned-session change made q67's loop jobs ~2× slower with
  * identical stage shapes. Prints the executed plan of the round under
  * both roots — the suspect is ReuseExchange across the self-join's
  * two references to the identical hop subtree. */
object ProbeCcClone {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.build("probe-cc-clone")

    def round(sess: org.apache.spark.sql.SparkSession,
              edgesOn: DataFrame, tag: String): Unit = {
      val (bidir, _) = graft.core.Caching.eagerCounted(
        edgesOn.union(edgesOn.select(col("dst").as("src"), col("src").as("dst")))
          .where(col("src") =!= col("dst"))
          .repartition(col("dst")).dropDuplicates("src", "dst"))
      val labels = bidir.groupBy(col("src")).agg(min(col("dst")).as("__mn"))
        .select(col("src").as("id"),
          least(col("src"), col("__mn")).as("label"))
      val contrib = bidir
        .join(labels.select(col("id").as("dst"), col("label").as("nl"))
            .hint("shuffle_hash"), Seq("dst"))
        .select(col("src").as("id"), col("nl").as("label"),
          lit(null).cast("long").as("old"))
      val hopPlan = contrib.unionByName(
          labels.select(col("id"), col("label"), col("label").as("old")))
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"), max(col("old")).as("old"))
      val changed = sess.sparkContext.longAccumulator("cc_changed")
      val hop = hopPlan.map { r =>
          if (r.get(1) != r.get(2)) changed.add(1L)
          r
        }(org.apache.spark.sql.Encoders.row(hopPlan.schema))
      val next = hop.as("a")
        .join(hop.select(col("id").as("jid"), col("label").as("jl")).as("b")
            .hint("shuffle_hash"),
          col("a.label") === col("b.jid"), "left")
        .select(col("a.id").as("id"),
          coalesce(col("jl"), col("a.label")).as("label"))
      val t0 = System.nanoTime()
      val cp = next.localCheckpoint(true)
      println(f"[$tag] round job ${(System.nanoTime() - t0) / 1e9}%.3f s")
      val plan = next.queryExecution.executedPlan.toString
      val reuse = plan.linesIterator.count(_.contains("ReusedExchange"))
      val exch = plan.linesIterator.count(l => l.contains("Exchange") &&
        !l.contains("ReusedExchange"))
      println(s"[$tag] ReusedExchange nodes: $reuse; Exchange nodes: $exch")
      if (args.contains("--plan")) println(plan)
      cp.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
        case _ => ()
      }
      bidir.unpersist()
      sess.catalog.clearCache()
    }

    val keys = Tables.orders(s, dir).select(col("o_orderkey").cast("long").as("k"))
    val edges = keys.where(col("k") % 4 =!= 0)
      .select(col("k").as("src"), (col("k") - 1).as("dst"))

    // warm both paths once
    val warmClone = s.newSession()
    warmClone.conf.set("spark.sql.adaptive.enabled", "false")
    warmClone.conf.set("spark.sql.shuffle.partitions",
      s.conf.get("spark.sql.shuffle.partitions"))
    round(warmClone, org.apache.spark.sql.GraftSqlBridge.rebase(warmClone, edges), "warm-clone")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    round(s, edges, "warm-orig")
    s.conf.set("spark.sql.adaptive.enabled", "true")

    (1 to 3).foreach { i =>
      s.conf.set("spark.sql.adaptive.enabled", "false")
      round(s, edges, s"orig-$i")
      s.conf.set("spark.sql.adaptive.enabled", "true")
      val c = s.newSession()
      c.conf.set("spark.sql.adaptive.enabled", "false")
      c.conf.set("spark.sql.shuffle.partitions",
        s.conf.get("spark.sql.shuffle.partitions"))
      round(c, org.apache.spark.sql.GraftSqlBridge.rebase(c, edges), s"clone-$i")
    }
    // the SAME clone reused: if round 2+ drops to the orig session's
    // time, the cost is per-new-session first-use (executor-side
    // session state), and memoizing one loop session fixes it
    val m = s.newSession()
    m.conf.set("spark.sql.adaptive.enabled", "false")
    m.conf.set("spark.sql.shuffle.partitions",
      s.conf.get("spark.sql.shuffle.partitions"))
    (1 to 3).foreach { i =>
      round(m, org.apache.spark.sql.GraftSqlBridge.rebase(m, edges), s"memo-$i")
    }
    s.stop()
  }
}
