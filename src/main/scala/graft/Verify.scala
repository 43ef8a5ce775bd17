package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import graft.core.Sessions

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // dev convenience (driver passes exactly two args): extra args
    // restrict the dump to queries whose name contains one of them —
    // used by the SCALE.md sf1 crossover check to verify just the
    // heavy subset without paying for the full registry.
    val filters = args.drop(2)
    val picked =
      if (filters.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => filters.exists(n.contains) }
    val spark: SparkSession = Sessions.build("graft-verify")
    new java.io.File(outDir).mkdirs()
    picked.foreach { case (name, fn) =>
      // Continue on NonFatal AND LinkageError (a missing optional class
      // leaves the JVM healthy, and aborting here would skip the
      // remaining queries AND oracle_sql.json — zeroing the whole
      // round); after an OOM or other VirtualMachineError the remaining
      // results would come from a corrupted JVM, so those propagate —
      // a wrong-but-present result is worse than an absent one.
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch {
        case e @ (scala.util.control.NonFatal(_) | _: LinkageError) =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // drop per-query persist()s so caches don't accumulate across
      // the full registry's session
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
