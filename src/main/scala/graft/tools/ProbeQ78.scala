package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.Spans
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of q78's decontamination plan at a
  * given scale dir, to localize the sf10 superlinearity (corpus gram
  * explode vs benchmark gram distinct vs broadcast vs join+agg). */
object ProbeQ78 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.build("probe-q78")
    val d = Tables.documents(s, dir)
    val bench = d.where(col("doc_id") % 50 === 0)
    val corpus = d.where(col("doc_id") % 50 =!= 0)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    import graft.functions.NgramHashes
    def toks = filter(split(lower(trim(col("text"))), "\\s+"),
      w => length(w) > 0)
    // warm the scans
    d.count()
    time("corpus kernel explode") {
      corpus.select(col("doc_id"),
          explode(NgramHashes.ngram_hashes(toks, 8)).as("g"))
        .select(xxhash64(col("g"))).count()
    }
    time("corpus kernel explode_outer + n_windows") {
      corpus.select(col("doc_id"),
          greatest(size(toks) - lit(7), lit(0)).cast("long").as("n_windows"),
          explode_outer(NgramHashes.ngram_hashes(toks, 8)).as("g"))
        .select(xxhash64(col("g"))).count()
    }
    time("bench grams distinct") {
      bench.select(explode(NgramHashes.ngram_hashes(toks, 8)).as("g"))
        .distinct().count()
    }
    time("full decontaminationStats") {
      Spans.decontaminationStats(corpus, bench, "doc_id", "text", n = 8).count()
    }
    time("full again (warm)") {
      Spans.decontaminationStats(corpus, bench, "doc_id", "text", n = 8).count()
    }
    time("full via noop sink") {
      Spans.decontaminationStats(corpus, bench, "doc_id", "text", n = 8)
        .write.mode("overwrite").format("noop").save(); 0L
    }
    time("noop again (warm)") {
      Spans.decontaminationStats(corpus, bench, "doc_id", "text", n = 8)
        .write.mode("overwrite").format("noop").save(); 0L
    }
    // isolate: outer vs inner Generate under the full (unpruned) plan
    val grams = NgramHashes.ngram_hashes(toks, 8)
    time("explode_outer via noop") {
      corpus.select(col("doc_id"),
          greatest(size(toks) - lit(7), lit(0)).cast("long").as("n_windows"),
          explode_outer(grams).as("g"))
        .write.mode("overwrite").format("noop").save(); 0L
    }
    time("padded inner explode via noop") {
      corpus.select(col("doc_id"),
          greatest(size(toks) - lit(7), lit(0)).cast("long").as("n_windows"),
          explode(when(size(grams) === 0,
              array(lit(null).cast("long"))).otherwise(grams)).as("g"))
        .write.mode("overwrite").format("noop").save(); 0L
    }
    time("explode_outer via toRdd.count") {
      corpus.select(col("doc_id"),
          greatest(size(toks) - lit(7), lit(0)).cast("long").as("n_windows"),
          explode_outer(grams).as("g"))
        .queryExecution.toRdd.count()
    }
    time("full decon via toRdd.count") {
      Spans.decontaminationStats(corpus, bench, "doc_id", "text", n = 8)
        .queryExecution.toRdd.count()
    }
    time("narrow explode via toRdd.count") {
      corpus.select(explode(grams).as("g")).queryExecution.toRdd.count()
    }
    println("=== SLOW PLAN (with pass-through cols) ===")
    corpus.select(col("doc_id"),
        greatest(size(toks) - lit(7), lit(0)).cast("long").as("n_windows"),
        explode_outer(grams).as("g"))
      .explain("formatted")
    println("=== FAST PLAN (narrow) ===")
    corpus.select(col("doc_id"),
        explode(NgramHashes.ngram_hashes(toks, 8)).as("gram"))
      .select(xxhash64(col("gram")).as("g")).explain("formatted")
    s.stop()
  }
}
