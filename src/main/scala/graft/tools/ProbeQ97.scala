package graft.tools

import graft.core.{Sessions, Tables}
import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Dev probe backing the q97 SCALE.md rows: the default window form
  * ([[graft.ops.Sampling.perSourceCap]] — Catalyst's WindowGroupLimit
  * rewrite when cap is at or under
  * `spark.sql.window.group.limit.threshold`) vs the bins-bounded
  * distributed selection ([[graft.ops.Sampling.perSourceCapLargeCap]])
  * across fixture decades, cap regimes (SPARK_GRAFT_CAP), and the
  * hot-domain shape (SPARK_GRAFT_SKEW=1 remaps ~90% of docs onto one
  * source — the regime where an above-threshold cap turns the window
  * form into a single straggler sort task). The plan line prints
  * whether the group-limit rewrite actually fired.
  *
  * Both legs force through the noop sink; the kept-set equality is
  * asserted once per run (hash of the kept ids) so the fast leg
  * can't win by computing something else. */
object ProbeQ97 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cap = sys.env.getOrElse("SPARK_GRAFT_CAP", "1000").toLong
    val bins = sys.env.getOrElse("SPARK_GRAFT_BINS", "4096").toInt
    val s = Sessions.build("probe-q97")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-24s $sec%8.2f s"); sec
    }

    // FULL rows: the operator's contract returns the kept documents,
    // so the naive window pays a whole-corpus shuffle of every column
    // (text included) to sort — the selection form's keep branches are
    // map-side filters and only the bins-bounded histogram plus the
    // boundary bin ever shuffle
    // SPARK_GRAFT_SKEW=1 remaps ~90% of docs onto ONE source — the
    // hot-domain shape (one crawl domain dominating the corpus) where
    // the window form's per-source sort becomes a single straggler task
    val raw = Tables.documents(s, dir)
    val docs =
      if (sys.env.get("SPARK_GRAFT_SKEW").contains("1"))
        raw.withColumn("source",
          when(pmod(col("doc_id"), lit(10L)) < 9, lit("hot"))
            .otherwise(col("source")))
      else raw
    t("warmup")(noop(docs))
    println(s"docs=${docs.count()} cap=$cap bins=$bins dir=$dir")

    t("selection (large-cap)") {
      noop(Sampling.perSourceCapLargeCap(docs, "doc_id", "source", cap, bins))
    }
    def windowForm = Sampling.perSourceCap(docs, "doc_id", "source", cap, bins)
    t("window form (default)")(noop(windowForm))
    val wplan = windowForm.queryExecution.executedPlan.toString
    println(s"window plan: groupLimit=${wplan.contains("WindowGroupLimit")} " +
      s"exch=${"Exchange".r.findAllIn(wplan).size}")

    def keyHash(df: org.apache.spark.sql.DataFrame): (Long, Long) =
      df.agg(coalesce(sum(pmod(xxhash64(col("doc_id")), lit(1000000007L))),
          lit(0L)).cast("long"), count(lit(1)))
        .collect()(0) match { case r => (r.getLong(0), r.getLong(1)) }
    val a = keyHash(
      Sampling.perSourceCapLargeCap(docs, "doc_id", "source", cap, bins))
    val b = keyHash(windowForm)
    println(s"kept-set hash check: ${if (a == b) "ok" else s"MISMATCH $a $b"}")
    s.stop()
  }
}
