package graft

import graft.core.Tables
import graft.ops.Sharding
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  private def docs = Tables.documents(spark, SparkTestBase.sf)

  test("shard+position are pure id functions: stable under repartition and input order") {
    val base = Sharding.assign(docs.select($"doc_id"), "doc_id", 16, 7L)
      .select($"doc_id", $"shard", $"position")
      .as[(Long, Int, Int)].collect().toMap2
    val shuffled = Sharding.assign(
        docs.select($"doc_id").orderBy($"doc_id".desc).repartition(7),
        "doc_id", 16, 7L)
      .select($"doc_id", $"shard", $"position")
      .as[(Long, Int, Int)].collect().toMap2
    assert(base == shuffled)
  }

  implicit class TupArr(rows: Array[(Long, Int, Int)]) {
    def toMap2: Map[Long, (Int, Int)] =
      rows.map { case (id, s, p) => (id, (s, p)) }.toMap
  }

  test("positions are 1..n contiguous per shard; total order unique; shards balanced") {
    val a = Sharding.assign(docs.select($"doc_id"), "doc_id", 32, 42L)
      .select($"shard", $"position", $"doc_id")
      .as[(Int, Int, Long)].collect().toSeq
    val n = a.size
    a.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.map(_._2).sorted == (1 to rows.size),
        s"shard $s positions not contiguous")
    }
    // hash balance: every shard within 3x sqrt-uniform deviation
    val expect = n.toDouble / 32
    val sizes = a.groupBy(_._1).map(_._2.size)
    assert(sizes.size == 32, s"empty shards: ${32 - sizes.size}")
    sizes.foreach { sz =>
      assert(math.abs(sz - expect) < 3 * math.sqrt(expect) + 5,
        s"shard size $sz vs uniform $expect")
    }
  }

  test("a different seed is a different permutation; same seed replays exactly") {
    val ids = docs.select($"doc_id")
    def perm(seed: Long) =
      Sharding.assign(ids, "doc_id", 8, seed)
        .select($"doc_id", $"shard", $"position")
        .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    val s1 = perm(1L); val s1b = perm(1L); val s2 = perm(2L)
    assert(s1 == s1b, "same seed must replay the identical permutation")
    assert(s1 != s2, "different seeds must permute differently")
    // and not trivially: a majority of docs move shard or position
    val moved = s1.zip(s2).count { case (x, y) => x != y }
    assert(moved > s1.size / 2, s"only $moved/${s1.size} moved across seeds")
  }

  test("negative ids fail loudly (cross-engine parity guard)") {
    val bad = Seq(-1L, 2L).toDF("doc_id")
    val e = intercept[Exception] {
      Sharding.assign(bad, "doc_id", 4, 0L).collect()
    }
    assert(e.getMessage != null)
  }

  test("writeShards: one directory per shard, file rows in training order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Sharding.writeShards(docs.select($"doc_id", $"source"), "doc_id",
      8, 42L, s"$dir/out")
    val shardDirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == 8, s"got ${shardDirs.map(_.getName).toSeq}")
    // per shard: read the parquet files back WITHOUT re-sorting — row
    // order inside the artifact must already be training order
    val expected = Sharding.assign(docs.select($"doc_id", $"source"),
        "doc_id", 8, 42L)
      .select($"shard", $"position", $"doc_id")
      .as[(Int, Int, Long)].collect()
      .groupBy(_._1).map { case (s, rows) =>
        (s, rows.sortBy(_._2).map(_._3).toSeq) }
    shardDirs.foreach { d =>
      val s = d.getName.stripPrefix("shard=").toInt
      val inFile = spark.read.parquet(d.getPath)
        .select($"position", $"doc_id")
        .as[(Int, Long)].collect().toSeq
      // parquet read preserves within-file row order; single file per
      // shard is the writeShards layout (one task per shard)
      assert(inFile.map(_._2) == expected(s),
        s"shard $s artifact order != training order")
      assert(inFile.map(_._1) == (1 to inFile.size), s"shard $s positions")
    }
  }
}
