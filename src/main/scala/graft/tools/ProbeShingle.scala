package graft.tools

import graft.core.{Sessions, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Dev probe: isolate the shingle-expression cost. */
object ProbeShingle {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.build("probe-shingle")
    val d = Tables.documents(spark, sfDir)
    d.count()
    def timed(label: String)(c: Column): Unit = {
      val t0 = System.nanoTime()
      d.select(c.as("x")).selectExpr("sum(size(x))").collect()
      println(f"VARIANT $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val words = split(lower(trim(col("text"))), "\\s+")
    timed("tokens-only")(words)
    timed("seq-slice-concat (current)") {
      array_distinct(
        when(size(words) >= 2,
          transform(sequence(lit(1), size(words) - lit(1)),
            i => concat_ws(" ", slice(words, i, lit(2)))))
          .otherwise(array(concat_ws(" ", words))))
    }
    timed("zip-with-shifted") {
      array_distinct(
        when(size(words) >= 2,
          slice(zip_with(words, slice(words, 2, 1000000),
            (a, b) => concat(a, lit(" "), b)), lit(1), size(words) - 1))
          .otherwise(array(concat_ws(" ", words))))
    }
    timed("transform-element-at") {
      array_distinct(
        when(size(words) >= 2,
          transform(sequence(lit(1), size(words) - lit(1)),
            i => concat(element_at(words, i), lit(" "), element_at(words, i + 1))))
          .otherwise(array(concat_ws(" ", words))))
    }
    spark.stop()
  }
}
