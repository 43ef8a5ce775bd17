package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) handling beyond AQE's runtime skew-join splitting
  * (which `graft.core.Sessions` enables): explicit salting shapes for
  * the two cases AQE does NOT cover —
  *
  *  1. skewed AGGREGATION state: a partial aggregate that doesn't
  *     shrink (countDistinct, collect_*) concentrates one hot group's
  *     whole state in one task;
  *  2. skewed BROADCAST-INELIGIBLE equi-joins where one side's hot key
  *     would swamp a single shuffle partition and the join is not a
  *     sort-merge join AQE can split (e.g. feeding a downstream
  *     co-partitioned op).
  *
  * Both transforms are ALGEBRAIC rewrites — results are exactly equal
  * to the unsalted forms (asserted in OpsSpec), so they can be dropped
  * in wherever a profile shows a straggler.
  */
object Skew {

  /** Skew-robust distinct count: expand the group key with the distinct
    * value FIRST (that shuffle spreads a hot group across the cluster —
    * each (key, value) pair is its own row, so partial aggregation
    * shrinks it map-side), then count rows per key. Two well-distributed
    * shuffles instead of one skewed one; exactly equal to
    * `groupBy(keys).agg(countDistinct(valueCol))` (nulls excluded,
    * matching countDistinct). */
  def distinctCountSalted(df: DataFrame, keys: Seq[String], valueCol: String,
                          outCol: String): DataFrame =
    // NULL rows are kept through the first shuffle (a key whose values
    // are ALL null must still yield a (key, 0) row, exactly like
    // countDistinct) and excluded only from the final count.
    df.select((keys :+ valueCol).map(col): _*)
      .distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as(outCol))

  /** Salted equi-join for a skewed LEFT side against a RIGHT side too
    * big to broadcast: the left's shuffle key gains a deterministic
    * salt in [0, buckets) derived from `saltFrom` (any well-distributed
    * left column — an id, a timestamp), and the right side is
    * replicated `buckets` times so every (key, salt) pair finds its
    * match. Row-for-row equal to `left.join(right, keys)` (inner).
    *
    * Cost model: right side is small-but-unbroadcastable (the classic
    * mid-size dim); replication multiplies its shuffle volume by
    * `buckets` in exchange for splitting each hot left key across
    * `buckets` tasks. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                      saltFrom: Column, buckets: Int): DataFrame = {
    require(buckets > 1, "buckets must be > 1")
    // withColumn REPLACES an existing column of the same name — a user
    // __salt column would silently become the join key and then be
    // dropped from the output, breaking the row-for-row contract.
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedInnerJoin reserves the __salt column name; rename it on the input")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(saltFrom), lit(buckets.toLong)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
