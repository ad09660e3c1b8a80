package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Salted equi-join for skewed keys.
  *
  * A hash-partitioned join sends every row of one key to ONE reducer —
  * a hot key (the null/default/dominant category at 100 TB) turns the
  * join into a single straggler task. Salting splits each hot key's
  * rows across `factor` sub-partitions: the big side gets a salt in
  * [0, factor) per row, the small side is replicated once per salt
  * value, and the join key becomes (key, salt) — same output, factor-
  * way parallel hot keys. The trade is a factor-times replication of
  * the small side, which is exactly the broadcast trade without
  * needing the small side to fit in one broadcast block.
  *
  * AQE's skew-join handles sort-merge skew adaptively at runtime
  * (enabled in GraftSession); explicit salting remains the tool when
  * the skew is in an AGGREGATION upstream of the join or the planner
  * must be forced (e.g. deterministic test plans).
  */
object SkewJoin {

  /** Inner equi-join of a skewed big side against a small side.
    * The salt derives from a per-row id, not the key, so it is
    * uniformly distributed WITHIN each key — result set is identical
    * to the unsalted join (spec-pinned).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name; rename it on the inputs")
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    // merge hint: salting only means anything under a PARTITIONED join
    // — callers reach for it precisely when the small side is too big
    // (or too replicated) to broadcast; without the hint a small test
    // dim would plan as BroadcastHashJoin and the salt would spread
    // nothing while still paying the explode
    salted.join(replicated.hint("merge"), keys :+ "__salt").drop("__salt")
  }
}
