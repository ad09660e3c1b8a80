package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Measure PageRank wall time vs iteration count after the round-12
  * per-iteration lineage cut: without it, raising iters toward
  * convergence (10-20 typical for authority scores) hit quadratic
  * plan-analysis growth; with it, time should scale ~linearly in
  * iters. Uses the p87 edge construction on the sf0.1 documents
  * table so the row is comparable with the benched p87 (iters=5).
  */
object ProbePageRank {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("probe-pagerank", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    // the p87 synthetic link graph, verbatim: 3 out-links per doc,
    // preferential-attachment skew toward low ids
    val edges = d.select(col("doc_id").as("src"),
      explode(array((0 until 3).map(j =>
        graft.ops.Hashing.hex64(concat(col("doc_id").cast("string"),
          lit(s"-$j-pr"))) % (col("doc_id") + 1)): _*)).as("dst"))
    for (iters <- Seq(5, 10, 20)) {
      val t0 = System.nanoTime()
      graft.ops.PageRank.pageRank(d, edges, iters)
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE pagerank iters=$iters%-3d wall=$sec%.2f s")
    }
    spark.stop()
  }
}
