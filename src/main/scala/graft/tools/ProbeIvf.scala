package graft.tools

import graft.core.{Sessions, Tables}
import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Dev probe: measured IVF recall@5 vs the exact quantized top-k at a
  * given sfDir — the number q70's oracle floor must clear with margin. */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val s = Sessions.build("probe-ivf")
    val emb = Tables.embeddings(s, dir)
    val queries = emb.where(col("vec_id") < 50)
    val exact = Similarity.quantizedDotTopK(queries, emb, "vec_id", "embedding", k = 5)
      .persist()
    exact.count()
    val combos: Seq[(Int, Int)] =
      if (args.nonEmpty) Seq((args(0).toInt, args(1).toInt))
      else Seq((16, 4), (16, 6), (16, 8), (32, 8), (32, 12), (8, 4), (64, 16))
    combos.foreach { case (nc, np) =>
      val ann = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
          k = 5, nCentroids = nc, nProbe = np)
        .select(col("query_id"), col("corpus_id"), lit(1L).as("__hit"))
      val r = exact
        .join(ann, Seq("query_id", "corpus_id"), "left")
        .agg((sum(coalesce(col("__hit"), lit(0L))) / count(lit(1))).as("recall"))
        .collect()(0).getDouble(0)
      println(f"IVF recall@5 at $dir nCentroids=$nc nProbe=$np: $r%.4f")
    }
    s.stop()
  }
}
