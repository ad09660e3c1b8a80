package graft.tools

import graft.GraftSession
import graft.stats.{Ranks, Spearman}
import org.apache.spark.sql.functions._

/** Decompose c2_spearman_pairs cost at sf0.1: dedup+unpivot scan vs
  * rank window vs the pair join + typed aggregate. Run:
  *   sbt 'Test/runMain graft.tools.Probe6b /root/testdata/sf0.1'
  */
object Probe6b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("probe6b")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE6B $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def long0 = li
      .groupBy(col("l_returnflag"), (col("l_orderkey") * 100 + col("l_linenumber")).as("sk"))
      .agg(max(col("l_discount")).as("discount"),
        max(col("l_extendedprice")).as("extendedprice"),
        max(col("l_quantity")).as("quantity"))
      .unpivot(Array(col("l_returnflag"), col("sk")),
        Array(col("discount"), col("extendedprice"), col("quantity")), "item", "v")
    for (i <- 1 to 3) {
      time(s"unpivot_$i") { long0.write.mode("overwrite").format("noop").save() }
      time(s"ranked_$i") {
        Ranks.fractionalRank(long0, Seq(col("l_returnflag"), col("item")), col("v"), "__r0")
          .write.mode("overwrite").format("noop").save()
      }
      time(s"full_$i") {
        Spearman.pairCorrelationsDense(long0, Seq("l_returnflag"), "item", "sk", "v",
          knownItems = Some(Seq("discount", "extendedprice", "quantity")))
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
