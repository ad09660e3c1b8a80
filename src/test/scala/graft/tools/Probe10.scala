package graft.tools

import graft.GraftSession
import graft.ops.{AsOfJoin, EventTime}
import org.apache.spark.sql.functions._

/** Debug the self-source-lineage path of the custom as-of exec. */
object Probe10 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("probe10")
    val dir = "/root/testdata/sf0.001"
    val ev = EventTime.withTsNanos(spark.read.parquet(s"$dir/events.parquet"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_ns"), col("value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_ns"))
      .agg(max(col("value")).as("purchase_value"))
    val j = AsOfJoin.asofMerged(clicks, purchases, Seq("user_id"), "ts_ns",
      Seq("purchase_value"))
    println("=== analyzed ===")
    println(j.queryExecution.analyzed.treeString)
    println("=== optimized ===")
    println(j.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
