package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.Spans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe backing the q102 SCALE.md rows: does INCREMENTAL
  * paragraph cleaning ([[graft.llm.Spans
  * .removeDuplicateParagraphsIncremental]] against a persisted
  * [[graft.llm.Spans.paragraphHashStore]]) scale with the BATCH while
  * one-shot cleaning scales with the CORPUS — the q95 question at
  * paragraph grain?
  *
  * Design mirrors ProbeQ95/ProbeQ98Svc: ~fixed-size arriving batch
  * (hash-modulo slice, ids boosted monotone above the corpus — the
  * admission contract — and landed as its own parquet before the timed
  * probe), corpus grows a decade per run; paragraphs injected q94-style
  * (two corpus-wide boilerplate families + unique footnotes). Legs:
  *   1. store build+persist (amortized once per corpus life);
  *   2. probe — batch vs the stored hash set, read back from parquet;
  *   3. one-shot recompute over corpus ∪ batch (the cost the store
  *      avoids).
  * All legs force through the noop sink. */
object ProbeQ102 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mod = sys.env.getOrElse("SPARK_GRAFT_BATCH_MOD", "10").toLong
    val s = Sessions.build("probe-q102")
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $name%-24s $sec%8.2f s"); sec
    }
    val Big = 1000000000000L
    val id0 = col("doc_id")
    val para = when(id0 % 3 === 0,
        lit("subscribe to our newsletter for updates"))
      .when(id0 % 3 === 1, lit("copyright all rights reserved worldwide"))
      .otherwise(concat(lit("unique footnote ref "), id0.cast("string")))
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), concat(col("text"), lit("\n\n"), para).as("t"))
    val isBatch = pmod(xxhash64(col("doc_id")), lit(mod)) === 7
    val corpus = d.where(!isBatch)

    val root = java.nio.file.Files.createTempDirectory("graft_q102")
    try {
      d.where(isBatch)
        .select((col("doc_id") + Big).as("doc_id"), col("t"))
        .write.mode("overwrite").parquet(s"$root/arriving")
      val batch = s.read.parquet(s"$root/arriving")
      println(s"corpus=${corpus.count()} batch=${batch.count()} dir=$dir")
      t("store build+persist") {
        Spans.paragraphHashStore(corpus, "doc_id", "t")
          .write.mode("overwrite").parquet(s"$root/store")
      }
      val store = s.read.parquet(s"$root/store")
      val probeSec = t("probe vs stored hashes") {
        noop(Spans.removeDuplicateParagraphsIncremental(
          batch, "doc_id", "t", store))
      }
      val changed = Spans.removeDuplicateParagraphsIncremental(
          batch, "doc_id", "t", store)
        .where(col("changed")).count()
      println(s"batch docs changed: $changed")
      t("one-shot recompute") {
        noop(Spans.removeDuplicateParagraphs(
          corpus.unionByName(batch), "doc_id", "t"))
      }
      println(f"probe leg: $probeSec%.2f s")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
    s.stop()
  }
}
