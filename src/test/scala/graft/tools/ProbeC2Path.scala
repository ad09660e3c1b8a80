package graft

import graft.stats.Spearman
import org.apache.spark.sql.functions._

/** Times the c2 bench shape (3 metrics x ~200k samples x 3 flag
  * families at sf0.1) on the dense path's wide vs join plans:
  *   Test/runMain graft.ProbeC2Path [sfDir] [reps]
  */
object ProbeC2Path {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.getOrCreate("graft-probe-c2")
    spark.sparkContext.setLogLevel("WARN")
    val long = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_returnflag"),
        (col("l_orderkey") * 100 + col("l_linenumber")).as("sk"))
      .agg(max(col("l_discount")).as("discount"),
        max(col("l_extendedprice")).as("extendedprice"),
        max(col("l_quantity")).as("quantity"))
      .unpivot(Array(col("l_returnflag"), col("sk")),
        Array(col("discount"), col("extendedprice"), col("quantity")),
        "item", "v")
    val items = Seq("discount", "extendedprice", "quantity")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"C2PATH $name%-8s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    (1 to reps).foreach { _ =>
      time("wide")(Spearman.pairCorrelationsDense(long, Seq("l_returnflag"),
        "item", "sk", "v", knownItems = Some(items), wideLimit = 32).count())
      time("join")(Spearman.pairCorrelationsDense(long, Seq("l_returnflag"),
        "item", "sk", "v", knownItems = Some(items), wideLimit = 0).count())
    }
    spark.stop()
  }
}
