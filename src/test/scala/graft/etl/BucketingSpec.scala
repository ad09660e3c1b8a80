package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins: both sides bucketed by the join key
  * into the same bucket count must join with NO exchange on either
  * side — the shuffle that dominates a big⋈big join at scale is
  * replaced by file layout.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-dim join plans without any shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketing").toString
    val wh = new ParquetWarehouse(spark, dir)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ, not BHJ
    try {
      val fact = (1 to 10000)
        .map(i => (i.toLong % 500, i.toLong, (i % 97).toDouble))
        .toDF("sample_key", "row_id", "v")
      val dim = (0L until 500L).map(k => (k, s"GSM$k")).toDF("sample_key", "gsm")
      wh.writeBucketed("graft_b_fact", fact, "sample_key", buckets = 4)
      wh.writeBucketed("graft_b_dim", dim, "sample_key", buckets = 4)

      val joined = spark.table("graft_b_fact").join(spark.table("graft_b_dim"), "sample_key")
      val rows = joined.collect() // finalizes the (adaptive) plan
      assert(rows.length == 10000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")

      // contrast: the same join over plain (unbucketed) parquet shuffles
      fact.write.mode("overwrite").parquet(s"$dir/plain_fact")
      dim.write.mode("overwrite").parquet(s"$dir/plain_dim")
      val plainJoin = spark.read.parquet(s"$dir/plain_fact")
        .join(spark.read.parquet(s"$dir/plain_dim"), "sample_key")
      plainJoin.collect()
      assert(plainJoin.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_b_fact")
      spark.sql("DROP TABLE IF EXISTS graft_b_dim")
    }
  }
}
