package graft

import graft.stats.Spearman
import org.apache.spark.sql.functions._

/** Blocked-vs-dense measurement for the unfiltered-gene Spearman path
  * (round-4 verdict #2):
  *
  *   Test/runMain graft.ProbeBlockedSpearman [itemCounts,...] [nSamples] [nBlocks]
  *
  * Synthesizes a complete I-item x nSamples matrix (one family) and
  * times the dense join plan against the blocked enumeration at each I.
  * The interesting axes: wall growth across I (pair count grows I^2 —
  * sub-16x wall growth from I=500 to I=2000 means the enumeration is
  * not bottlenecked on a hot key) and the per-task pair fan-out, which
  * is I^2 per (family,sample) join group for dense vs (I/B)^2 for
  * blocked. Output feeds BASELINE.md's round-5 measured table.
  */
object ProbeBlockedSpearman {
  def main(args: Array[String]): Unit = {
    val counts = (if (args.nonEmpty) args(0) else "500,1000,2000")
      .split(",").map(_.trim.toInt).toSeq
    val nSamples = if (args.length > 1) args(1).toInt else 200
    val nBlocks = if (args.length > 2) args(2).toInt else 16
    val spark = GraftSession.getOrCreate("graft-probe-blocked")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"BLOCKED $name%-28s $s%8.2f s  rows=$n")
      s
    }

    counts.foreach { i =>
      // deterministic synthetic values; complete matrix
      val long = spark.range(i.toLong * nSamples).select(
        lit("ST1").as("study"),
        (col("id") % i).as("gene"),
        (col("id") / i).cast("long").as("sample"),
        pmod(hash(col("id")), lit(100000)).cast("double").as("v"))
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(true)
      time(s"I=$i dense-join")(Spearman.pairCorrelationsDense(long, Seq("study"),
        "gene", "sample", "v").count())
      time(s"I=$i blocked(B=$nBlocks)")(Spearman.pairCorrelationsBlocked(long, Seq("study"),
        "gene", "sample", "v", nBlocks = nBlocks).count())
    }
    spark.stop()
  }
}
