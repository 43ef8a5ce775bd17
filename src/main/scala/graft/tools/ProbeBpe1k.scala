package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.llm.Bpe

/** Dev probe: the BPE round-count regime measurement behind SCALE.md —
  * trains `rounds` merges (default 1000) over the sf1 documents table
  * and prints cumulative + trailing-window per-round cost every 100
  * rounds, plus the word-table symbol stats at the end. The question
  * it answers: does per-round cost stay flat as the merge count grows
  * toward real vocabulary sizes (30-50k), or does the growing symbol
  * alphabet / shrinking mergeable-pair mass bend it? */
object ProbeBpe1k {

  /** The synthetic Zipf vocabulary used when the fixture corpus is too
    * small for real-tokenizer round counts: word w_id = 8-13
    * pseudo-random a-z chars keyed by id, count = n/rank (Zipf s=1).
    * Shared with [[ProbeBpeBatch]]. */
  def synthWords(spark: org.apache.spark.sql.SparkSession,
                 n: Long): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(1, n + 1).as[Long].map { id =>
      var v = id * 2654435761L % 2147483647L
      val len = 8 + (v % 6).toInt
      val sb = new StringBuilder
      var j = 0
      while (j < len) {
        v = (v ^ (v >> 13)) * 3266489917L % 2147483647L
        sb += ('a' + (v % 26).toInt).toChar
        j += 1
      }
      (math.max(1L, n / id), sb.result())
    }.toDF("cnt", "w")
      .withColumn("syms", transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))))
      .select(col("cnt"), col("syms"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata-sf1")
    val rounds = if (args.length > 1) args(1).toInt else 1000
    val spark = Sessions.build("graft-probe-bpe1k")

    // inline re-implementation of trainMerges' loop with a timer per
    // round (the library method has no timing hook; keep in sync).
    // "synth:<n>" builds an n-word Zipf vocabulary directly (the sf1
    // documents fixture holds only 292 distinct words and exhausts at
    // 386 merges — real-tokenizer round counts need a real-sized
    // vocabulary): word w_id = 8-13 pseudo-random a-z chars keyed by
    // id, count = n/rank (Zipf s=1).
    var words = (if (sfDir.startsWith("synth:")) {
      synthWords(spark, sfDir.stripPrefix("synth:").toLong)
    } else {
      Bpe.wordCounts(Tables.documents(spark, sfDir).select(col("text")), "text")
        .select(col("cnt"), col("syms"))
    }).localCheckpoint()
    println(s"words=${words.count()}")
    var round = 1
    var exhausted = false
    val t0 = System.nanoTime()
    var windowStart = t0
    while (round <= rounds && !exhausted) {
      val top = words
        .where(size(col("syms")) >= 2)
        .select(col("cnt"), explode(
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("l"),
                        element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val old = words
        words = words
          .withColumn("syms", graft.functions.BpeKernels.merge_pair(
            col("syms"), top(0).getString(0), top(0).getString(1)))
          .localCheckpoint()
        old.unpersist()
        if (round % 100 == 0) {
          val now = System.nanoTime()
          println(f"round=$round%5d cum=${(now - t0) / 1e9}%8.1fs " +
            f"last100=${(now - windowStart) / 1e9 / 100}%6.3fs/round " +
            f"topCount=${top(0).getLong(2)}")
          windowStart = now
        }
        round += 1
      }
    }
    val stats = words.agg(
      count(lit(1)), sum(size(col("syms"))), max(size(col("syms")))).collect()(0)
    println(s"done rounds=${round - 1} exhausted=$exhausted " +
      s"words=${stats.getLong(0)} totalSyms=${stats.getLong(1)} " +
      s"maxSyms=${stats.getInt(2)} total=${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}
