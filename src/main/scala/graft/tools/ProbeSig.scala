package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: sub-stage timing INSIDE the LSH candidate generator
  * (signature agg vs banding vs bucket-cap window vs self-join). */
object ProbeSig {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.build("probe-sig")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val d = Tables.documents(s, dir)
    t("warmup")(d.count())
    val sh = t("shingles+eager") {
      graft.core.Caching.eager(d.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 2).as("sh")))
    }
    val (bands, rows) = (16, 4)
    val numHashes = bands * rows
    def rotl(c: org.apache.spark.sql.Column, j: Int): org.apache.spark.sql.Column =
      if (j == 0) c else shiftleft(c, j).bitwiseOR(shiftrightunsigned(c, 64 - j))
    val sigDf = sh.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"),
        xxhash64(lit(0), col("s")).as("h1"), xxhash64(lit(1), col("s")).as("h2"))
      .groupBy(col("id"))
      .agg(min(col("h1").bitwiseXOR(col("h2"))).as("mh0"),
        (1 until numHashes).map(j =>
          min(col("h1").bitwiseXOR(rotl(col("h2"), j))).as(s"mh$j")): _*)
    t("warm sig agg (codegen)")(sigDf.count())
    t("sig agg again")(sigDf.count())
    val banded = sigDf.select(col("id"), posexplode(
        array((0 until bands).map { b =>
          xxhash64((lit(b) +: (0 until rows).map(r =>
            col(s"mh${b * rows + r}"))): _*)
        }: _*)).as(Seq("band", "band_hash")))
    t("banded count")(banded.count())
    val capped = t("capped eager") {
      graft.core.Caching.eager(banded
        .withColumn("bucket_n",
          count(lit(1)).over(Window.partitionBy(col("band"), col("band_hash"))))
        .where(col("bucket_n") <= 500)
        .drop("bucket_n"))
    }
    t("self-join+distinct") {
      val c = capped.as("a").join(capped.as("b"),
          col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      println("candidates: " + c.count())
    }
    s.stop()
  }
}
