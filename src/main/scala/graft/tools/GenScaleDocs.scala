package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Documents-only scale-up generator — the sf100 fixture for the
  * MAP-SIDE text-kernel decade measurements (q83's scrub; anything
  * whose cost is per-document, not cross-document). Replicates an
  * existing scaled directory's documents ×N into disjoint doc_id
  * ranges with [[GenScale]]'s word-suffix bijection, and copies the
  * region dim (graft.Bench's warmup/floor table). NOT intended for
  * dedup/similarity fixtures: double-suffixed words from stacked
  * generations make cross-replica shingle collisions ill-controlled
  * there — use GenScale end-to-end for those (its invariants are
  * argued per-table).
  *
  * `tailLen` > 0 appends that many doc-unique tokens to every doc
  * (`zq<doc_id>x<i>`) — a NATURAL-VOCABULARY tail: each tailed doc
  * contributes `tailLen` singleton bigrams, so vocabulary grows with
  * the corpus the way real text's does (the replicated fixtures
  * alone have no singleton bigrams — q99's `minCount` prune removes
  * zero rows on them, which is why its prune leg was untimed through
  * round 10).
  *
  * Usage: runMain graft.tools.GenScaleDocs <inDir> <outDir> <replicas> [tailLen]
  */
object GenScaleDocs {
  def main(args: Array[String]): Unit = {
    val inDir  = if (args.length > 0) args(0) else "/root/repo/testdata-sf10"
    val outDir = if (args.length > 1) args(1) else "/root/repo/testdata-sf100docs"
    val n      = if (args.length > 2) args(2).toInt else 10
    val tailLen = if (args.length > 3) args(3).toInt else 0
    val spark: SparkSession = Sessions.build("graft-genscale-docs")

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    write(Tables.load(spark, inDir, "region"), "region")

    // beyond any doc_id the sf10 input holds (GenScale offsets stay
    // under 10 * 10^7)
    val KeyOff = 10000000000L
    val preserved = GenScale.preservedWords.map(x => x: Any)
    val replicas = (0 until n).map { k =>
      val base = Tables.documents(spark, inDir)
      val txt =
        if (k == 0) col("text")
        else array_join(
          transform(split(col("text"), "\\s+"),
            w => when(w.isin(preserved: _*) || length(w) === 0, w)
              .otherwise(concat(w, lit(s"s$k")))), " ")
      base.withColumn("doc_id", col("doc_id") + lit(k * KeyOff))
        .withColumn("text", txt)
    }
    val unioned = replicas.reduce(_ unionAll _)
    val tailed =
      if (tailLen == 0) unioned
      else unioned.withColumn("text",
        concat(col("text"), lit(" "),
          array_join(transform(sequence(lit(0), lit(tailLen - 1)),
            i => concat(lit("zq"), col("doc_id"), lit("x"), i)), " ")))
    write(tailed.withColumn("n_chars", length(col("text")).cast("long")),
      "documents")
    println(s"""{"gen":"$outDir","replicas":$n,"tail":$tailLen,"tables":["region","documents"]}""")
    spark.stop()
  }
}
