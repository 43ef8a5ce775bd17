package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Sessions
import graft.llm.Bpe

/** Dev probe: the batched-BPE driver-round-trip measurement behind
  * SCALE.md — trains the SAME merge budget with the sequential-exact
  * batch size 1 and with larger batches over a real-vocabulary-sized
  * synthetic Zipf word table ([[ProbeBpe1k.synthWords]]), printing
  * wall time, cycles (Spark job round-trips), and merges per config.
  * The question it answers: how much of sequential training's cost is
  * the per-merge driver round-trip that batching amortizes, and how
  * often does greedy non-interacting selection under-fill a batch on
  * a Zipf alphabet?
  *
  * Usage: runMain graft.tools.ProbeBpeBatch [nWords] [rounds] [b1,b2,...]
  */
object ProbeBpeBatch {
  def main(args: Array[String]): Unit = {
    val nWords = args.headOption.map(_.toLong).getOrElse(200000L)
    val rounds = if (args.length > 1) args(1).toInt else 1000
    val batches =
      if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
      else Seq(1, 8, 32)
    val spark = Sessions.build("graft-probe-bpe-batch")
    val words = ProbeBpe1k.synthWords(spark, nWords).localCheckpoint()
    println(s"words=${words.count()} rounds=$rounds")
    batches.foreach { b =>
      val t0 = System.nanoTime()
      val m = Bpe.trainMergesBatchedFromWords(words, rounds, b)
        .agg(count(lit(1)), max(col("pass"))).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      val merges = m.getLong(0)
      val cycles = m.getInt(1)
      println(f"PROBEBPEBATCH batch=$b%3d merges=$merges%5d " +
        f"cycles=$cycles%5d fill=${merges.toDouble / cycles}%5.2f " +
        f"sec=$sec%8.1f perMerge=${sec / merges}%6.4f")
    }
    spark.stop()
  }
}
