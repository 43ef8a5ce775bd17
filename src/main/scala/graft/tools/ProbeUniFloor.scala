package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.LangModel
import org.apache.spark.sql.functions._

/** Dev probe: the q99 unigram-table treatment at web scale (round-12
  * directive) — INTERLEAVED in one JVM because cross-JVM runs of the
  * score leg swing 65-152 s with page-cache and ambient state (three
  * same-config ProbeLm runs measured exactly that spread). Compares,
  * at bigram minCount = 2, the status-quo unigram table against the
  * OOV-preserving singleton floor (`trainBigramLm(uniFloor = 2)` —
  * exact by the integer-bits arithmetic, spec-pinned), alternating
  * configs several times and reporting each leg. */
object ProbeUniFloor {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata-sf100tail")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val s = Sessions.build("probe-unifloor")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val d = Tables.documents(s, dir)
    val batch = d.where(col("doc_id") % 10 === 7)
    val corpus = d.where(col("doc_id") % 10 =!= 7)
    noop(d) // warm page cache + codegen
    println(s"docs=${d.count()} dir=$dir")
    (1 to reps).foreach { r =>
      for (fl <- Seq(1L, 2L); cached <- Seq(false, true)) {
        val (uni0, bi, total) =
          LangModel.trainBigramLm(corpus, "text", minCount = 2, uniFloor = fl)
        // cached = the production shape: a trained LM is a persisted
        // artifact, its build paid once — lazy uni plans re-run the
        // full reference aggregation inside EVERY consumer join, and
        // a tiny uni auto-broadcasts, which drops the exchange reuse
        // the shuffle form gets for free
        val uni = if (cached) graft.core.Caching.eager(uni0) else uni0
        val t0 = System.nanoTime()
        noop(LangModel.surprisal(batch, "doc_id", "text", uni, bi, total))
        println(f"UNIFLOOR rep$r floor=$fl cached=$cached " +
          f"score=${(System.nanoTime() - t0) / 1e9}%8.2f s")
        s.catalog.clearCache()
      }
    }
    // table sizes once, for the record (not part of the timed legs)
    Seq(1L, 2L).foreach { fl =>
      val (uni, bi, _) =
        LangModel.trainBigramLm(corpus, "text", minCount = 2, uniFloor = fl)
      println(s"floor=$fl uni=${uni.count()} bi=${bi.count()}")
    }
    s.stop()
  }
}
