package graft.tools

import graft.GraftSession
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Decompose p4_simhash cost: signature compute vs window-guard vs
  * block join vs the planted-dup union. Run:
  *   sbt 'Test/runMain graft.tools.Probe6 /root/testdata/sf0.1'
  */
object Probe6 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("probe6")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE6 $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d0 = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val planted = d0.where(col("doc_id") % 50 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
    val docs = d0.unionByName(planted)
    docs.count()
    for (i <- 1 to 3) {
      time(s"sig_only_$i") {
        Dedup.simhash(docs, 60, "doc_id", "text").write.mode("overwrite").format("noop").save()
      }
      time(s"sig_ckpt_$i") {
        Dedup.simhash(docs, 60, "doc_id", "text").localCheckpoint(true).count()
      }
      time(s"pairs_full_$i") {
        Dedup.simhashPairs(docs).write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
