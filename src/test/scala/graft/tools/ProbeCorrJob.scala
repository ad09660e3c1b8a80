package graft

import graft.etl.CorrelationJob

/** End-to-end correlation-job timing on the scale fixture, plain vs
  * bucketized facts:
  *   Test/runMain graft.ProbeCorrJob [whDir] [reps]
  */
object ProbeCorrJob {
  def main(args: Array[String]): Unit = {
    val wh = args.headOption.getOrElse("/tmp/scale_study/wh")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.getOrCreate("graft-probe-corrjob")
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"CORRJOB $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.1f s  pairs=$n")
    }
    (1 to reps).foreach { _ =>
      time("plain")(new CorrelationJob(spark, wh).run().pairs)
    }
    time("bucketize") {
      CorrelationJob.bucketizeFacts(spark, wh, buckets = 32); 0L
    }
    (1 to reps).foreach { _ =>
      time("bucketed")(new CorrelationJob(spark, wh, useBucketedFacts = true).run().pairs)
    }
    spark.stop()
  }
}
