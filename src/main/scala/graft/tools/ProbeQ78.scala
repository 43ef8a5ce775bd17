package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.Spans
import org.apache.spark.sql.functions._

/** Dev probe backing SCALE.md round-7: decontamination cost breakdown
  * (kernel gram explode, benchmark distinct, full operator) — all
  * forced through the noop sink, the bench's semantics; count() would
  * let the optimizer delete the join/agg subtree being measured. */
object ProbeQ78 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.build("probe-q78")
    val d = Tables.documents(s, dir)
    val bench = d.where(col("doc_id") % 50 === 0)
    val corpus = d.where(col("doc_id") % 50 =!= 0)
    import graft.functions.NgramHashes
    def toks = filter(split(lower(trim(col("text"))), "\\s+"),
      w => length(w) > 0)
    d.count() // warm the scan
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    time("corpus kernel gram explode") {
      noop(corpus.select(col("doc_id"),
        explode(NgramHashes.ngram_hashes(toks, 8)).as("g")))
    }
    time("bench grams distinct") {
      noop(bench.select(explode(NgramHashes.ngram_hashes(toks, 8)).as("g"))
        .distinct())
    }
    time("full decontaminationStats") {
      noop(Spans.decontaminationStats(corpus, bench, "doc_id", "text", n = 8))
    }
    time("full again (warm)") {
      noop(Spans.decontaminationStats(corpus, bench, "doc_id", "text", n = 8))
    }
    s.stop()
  }
}
