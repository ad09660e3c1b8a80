package graft.tools

import graft.GraftSession
import graft.ops.SubstringDedup
import org.apache.spark.sql.functions._

/** Decompose p36 cost: segmentation (per-position hashing) vs the
  * checkpoint vs dup-count + join-back, and whether the heavy
  * projection actually runs post-repartition (32-way) or collapsed
  * into the single-split scan task. Run:
  *   sbt 'Test/runMain graft.tools.Probe7 /root/testdata/sf0.1'
  */
object Probe7 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("probe7")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE7 $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d0 = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val spread = d0.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    d0.count()
    for (i <- 1 to 3) {
      time(s"segments_noop_single_$i") {
        SubstringDedup.segments(d0).write.mode("overwrite").format("noop").save()
      }
      time(s"segments_noop_spread_$i") {
        SubstringDedup.segments(spread).write.mode("overwrite").format("noop").save()
      }
      time(s"segments_ckpt_spread_$i") {
        SubstringDedup.segments(spread).localCheckpoint(true).count()
      }
      time(s"spanstats_full_$i") {
        SubstringDedup.spanStats(spread).write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
