package graft

import org.apache.spark.sql.functions._

/** Measures FusePercentiles: the 4-separate-percentiles query with the
  * rule excluded vs active:
  *   Test/runMain graft.ProbeFuse [sfDir] [reps]
  */
object ProbeFuse {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.getOrCreate("graft-probe-fuse")
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def q() = li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_extendedprice, 0.25)"),
      expr("percentile(l_extendedprice, 0.5)"),
      expr("percentile(l_extendedprice, 0.75)"),
      expr("percentile(l_extendedprice, 0.99)"))
    def time(name: String): Unit = {
      val t0 = System.nanoTime()
      q().write.mode("overwrite").format("noop").save()
      println(f"FUSE $name%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    (1 to reps).foreach { _ =>
      spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.FusePercentiles")
      time("excluded")
      spark.conf.unset("spark.sql.optimizer.excludedRules")
      time("fused")
    }
    spark.stop()
  }
}
