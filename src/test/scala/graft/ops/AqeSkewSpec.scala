package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join engagement pin — the RUNTIME half of the skew story.
  *
  * `SkewJoin.saltedJoin` (j8) is the plan-time fix for skew you know
  * about; AQE's OptimizeSkewedJoin is the runtime fix for skew you
  * don't: after the shuffle map stage, partitions larger than
  * skewedPartitionFactor × median split into advisory-sized reads so a
  * hot key stops being one straggler reducer. At 100 TB the two
  * compose — salt the keys you've profiled, let AQE catch the rest.
  *
  * This spec plants a hot key behind shrunken thresholds (the defaults
  * are sized for real clusters: 256 MB partitions) and pins that the
  * final adaptive plan actually marks the sort-merge join skew-handled
  * (`skew=true`) with more shuffle-read partitions than the static
  * shuffle would have — if a Spark upgrade or a GraftSession conf
  * change ever disables the optimization, this fails rather than
  * silently reverting to straggler behavior.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("OptimizeSkewedJoin splits the hot partition (skew=true in the final plan)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink the cluster-sized defaults to test scale: a partition
      // is "skewed" past 2x median AND 64 KiB, split into ~16 KiB reads
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      // force the sort-merge path: a broadcast join has no skewed
      // shuffle partition to split
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on ONE key with a fat payload vs 100 rows spread out:
      // the hot key's shuffle partition dwarfs the median
      val pad = "x" * 64
      val big = spark.range(0, 50100).select(
        when(col("id") < 50000, lit(7L)).otherwise(col("id") % 100).as("k"),
        concat(lit(pad), col("id")).as("payload"))
      val small = spark.range(0, 100).select(col("id").as("k"),
        concat(lit("label"), col("id")).as("label"))
      // observe the JOIN itself (payload kept in the output): a
      // downstream groupBy on the join key would FORBID the split —
      // AQE refuses to break a required hash distribution — and column
      // pruning would shrink the hot partition below the threshold
      val joined = big.join(small, "k")
      val rows = joined.collect()
      assert(rows.length == 50100, s"join row count ${rows.length} — data shape changed")
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot-key join skew-handled:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
