package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Band (interval) join: pair left rows with the right rows of the same
  * key whose time lies in [left.time - before, left.time + after].
  *
  * Spark's native plan for this is a BroadcastNestedLoopJoin — O(L·R)
  * per key and a broadcast of a whole side. This formulation buckets
  * time into fixed windows of width `before + after`: the left side
  * explodes into the (at most 2) buckets its band intersects, the
  * right side keeps its single bucket, and the band becomes an
  * EQUI-join on (keys..., bucket) plus a cheap exact filter. Each
  * (l, r) candidate meets exactly once because a right row owns one
  * bucket — no post-join dedup. At 100 TB the bucket is part of the
  * shuffle key, so band neighborhoods co-locate and fan-out is bounded
  * by bucket occupancy — the same blocking idea as the LSH/IVF joins.
  *
  * Times are integer (e.g. epoch nanos); bucket indices are computed
  * in decimal then floored, so 2^60-magnitude nanos never pass through
  * a double. The right side's keys and time arrive renamed with a
  * `right_` prefix in the output; its remaining (payload) columns keep
  * their names and must be disjoint from the left's (enforced).
  */
object RangeJoin {

  private def floorDiv(c: Column, d: Long): Column =
    floor(c.cast("decimal(38,0)") / lit(d)).cast("long")

  def bandJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      lTime: String, rTime: String, before: Long, after: Long): DataFrame = {
    require(before >= 0 && after >= 0 && before + after > 0,
      "band width must be positive")
    val w = before + after
    // The join keys and right time get a right_ prefix BEFORE the join
    // (no same-lineage ambiguous references); every OTHER right column
    // must already be disjoint from the left — rejected here rather
    // than surfacing later as AMBIGUOUS_REFERENCE on the output.
    require((keys :+ rTime).forall(right.columns.contains),
      s"right side must contain ${keys.mkString(",")} and $rTime")
    val renamed = (keys :+ rTime).distinct
    val overlap = right.columns.filterNot(renamed.contains).filter(left.columns.contains)
    require(overlap.isEmpty,
      s"right columns ${overlap.mkString(",")} collide with left columns — rename them first")
    val r0 = renamed.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"right_$c"))
    val rt = col(s"right_$rTime")

    val l = left.withColumn("__bucket",
      explode(sequence(floorDiv(col(lTime) - before, w), floorDiv(col(lTime) + after, w))))
    val r = r0.withColumn("__bucket", floorDiv(rt, w))
    val keyCond = keys.map(k => col(k) === col(s"right_$k"))
    val cond = (keyCond :+ (l("__bucket") === r("__bucket")) :+
      (rt >= col(lTime) - before) :+ (rt <= col(lTime) + after)).reduce(_ && _)
    l.join(r, cond)
      .drop("__bucket")
      .drop(keys.map(k => s"right_$k"): _*)
  }
}
