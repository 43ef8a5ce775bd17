package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Scale-up input generator for the SCALE.md crossover bench
  * (VERDICT r6 directive 1): replicates the driver's sf0.1 fact tables
  * xN into an sf1-equivalent directory, WITHOUT changing the
  * per-replica workload shape.
  *
  * The point of the transform design is that "10x data" must mean "10x
  * work", not "100x": naive row duplication makes every self-join-ish
  * operator (LSH buckets, cosine candidates, range joins, dedup
  * clustering) quadratic in the replica count because copies collide
  * with each other. Each replica k therefore gets a structure-preserving
  * bijection that leaves INTRA-replica results identical to sf0.1 while
  * making CROSS-replica matches as unlikely as two random rows matching:
  *
  *  - documents: every non-stopword word gets a per-replica suffix.
  *    Word-level shingle Jaccard is invariant under a word bijection, so
  *    near-dup pairs/clusters per replica are exactly the sf0.1 ones;
  *    the preserved set (quality-score stopwords + lang-ID marker words)
  *    keeps q52's language and stopword-ratio gates firing identically.
  *  - embeddings: cyclic rotation of the 64 dims by 7*k. Rotation is an
  *    orthonormal map, so intra-replica cosine/top-k are bit-preserved;
  *    cross-replica pairs decorrelate to background similarity.
  *  - events/orders/lineitem: ids offset into disjoint per-replica
  *    ranges, dates shifted by whole replica epochs so time-window joins
  *    (q62) and calendar grouping stay within a replica.
  *
  * Dim tables (region..part) are copied as-is, mirroring how TPC-H dims
  * grow sublinearly; every fact FK they serve is left untouched.
  *
  * Usage: runMain graft.tools.GenScale <inDir> <outDir> <replicas>
  */
object GenScale {

  /** Words that must survive the per-replica text bijection so the
    * corpus-prep gates (TextStats.qualityScore stopword ratio +
    * langIdHeuristic marker voting) keep identical selectivity. */
  val preservedWords: Seq[String] =
    graft.llm.TextStats.defaultStopwords ++
      Seq("le", "la", "et", "el", "los", "y", "der", "und", "die")

  def main(args: Array[String]): Unit = {
    val inDir  = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/root/repo/testdata-sf1"
    val n      = if (args.length > 2) args(2).toInt else 10
    val spark  = Sessions.build("graft-genscale")

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    // dims: verbatim copies
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(Tables.load(spark, inDir, t), t)
    }

    def replicate(base: DataFrame)(tf: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(k => tf(base, k)).reduce(_ unionAll _)

    val KeyOff  = 10000000L  // disjoint id ranges per replica
    val DayOff  = 3650       // whole-epoch date shift per replica

    // LOUD guard against chaining GenScale onto its own output: the
    // replica offsets are k*KeyOff, so a second application's ranges
    // COLLIDE with the first's (replica 1 of input-replica 0 == input
    // replica 1 → duplicate ids, 10-wide id stacks, media fixtures
    // with 1000-"wide" pseudo-families). Scale further by raising
    // `replicas` on the ORIGINAL input instead (e.g. sf0.1 ×100 for an
    // sf10-equivalent) — one application keeps every range disjoint.
    locally {
      val row = Tables.documents(spark, inDir)
        .agg(max(col("doc_id"))).collect()(0)
      // An empty documents table has no ids to collide; skip the guard.
      if (!row.isNullAt(0)) {
        val maxId = row.getLong(0)
        require(maxId < KeyOff,
          s"input $inDir already has replica-offset ids (max doc_id = " +
            s"$maxId >= $KeyOff): GenScale must not be applied to its own " +
            "output — raise `replicas` on the original fixture instead")
      }
    }

    write(replicate(Tables.orders(spark, inDir)) { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(k * KeyOff))
        .withColumn("o_orderdate", col("o_orderdate") + expr(s"INTERVAL ${k * DayOff} DAYS"))
    }, "orders")

    write(replicate(Tables.lineitem(spark, inDir)) { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * KeyOff))
        .withColumn("l_shipdate", col("l_shipdate") + expr(s"INTERVAL ${k * DayOff} DAYS"))
    }, "lineitem")

    // events: ts arrives normalized to TimestampType (micros) via
    // Tables.events; written back as micros, which both Spark and the
    // DuckDB twin read natively (the driver's nanos-annotated original
    // needed a read-side shim — see Tables.events).
    write(replicate(Tables.events(spark, inDir)) { (df, k) =>
      df.withColumn("event_id", col("event_id") + lit(k * KeyOff))
        .withColumn("user_id", col("user_id") + lit(k * KeyOff))
        .withColumn("ts", col("ts") + expr(s"INTERVAL ${k * DayOff} DAYS"))
    }, "events")

    // documents: suffix bijection on non-preserved words; n_chars
    // recomputed because the suffix lengthens the text.
    val preserved = preservedWords.map(x => x: Any)
    write(replicate(Tables.documents(spark, inDir)) { (df, k) =>
      val txt =
        if (k == 0) col("text")
        else array_join(
          transform(split(col("text"), "\\s+"),
            w => when(w.isin(preserved: _*) || length(w) === 0, w)
              .otherwise(concat(w, lit(s"r$k")))), " ")
      df.withColumn("doc_id", col("doc_id") + lit(k * KeyOff))
        .withColumn("text", txt)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    // embeddings: rotate dims by 7*k mod 64 (7 shares no factor with 64,
    // so all n rotations are distinct).
    write(replicate(Tables.embeddings(spark, inDir)) { (df, k) =>
      val d = 64
      val s = (7 * k) % d
      val emb =
        if (s == 0) col("embedding")
        else concat(slice(col("embedding"), s + 1, d - s), slice(col("embedding"), 1, s))
      df.withColumn("vec_id", col("vec_id") + lit(k * KeyOff))
        .withColumn("embedding", emb)
    }, "embeddings")

    println(s"""{"gen":"$outDir","replicas":$n}""")
    spark.stop()
  }
}
