package graft

import graft.stats.{Ranks, Spearman}
import org.apache.spark.sql.functions._

/** Spearman dense-path sub-step timings: runMain graft.Probe4 <sfDir> */
object Probe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-probe4")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE4 $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    li.groupBy("l_returnflag").count().count() // warm-up

    val long = li
      .select(col("l_returnflag"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("sk"),
        col("l_discount").as("discount"),
        col("l_extendedprice").as("extendedprice"),
        col("l_quantity").as("quantity"))
      .unpivot(Array(col("l_returnflag"), col("sk")),
        Array(col("discount"), col("extendedprice"), col("quantity")), "item", "v")

    time("long.count")(long.count())
    val ranked = Ranks.fractionalRank(long, Seq(col("l_returnflag"), col("item")), col("v"), "__r0")
    time("ranked.count")(ranked.count())
    val blocks = ranked.groupBy(col("l_returnflag"), col("sk"))
      .agg(sort_array(collect_list(struct(col("item").as("i"), col("__r0").as("r"), col("v").as("v")))).as("__items"))
    time("blocks.count")(blocks.count())
    val pairs = blocks.select(col("l_returnflag"), explode(expr(
      """flatten(transform(__items, (x, ix) ->
        |  transform(slice(__items, ix + 2, size(__items)), y ->
        |    struct(x.i AS item_a, y.i AS item_b, x.r AS ra, y.r AS rb,
        |           x.v AS va, y.v AS vb))))""".stripMargin)).as("__p"))
    time("pairs.count")(pairs.count())
    time("full dense")(Spearman.pairCorrelationsDense(long, Seq("l_returnflag"), "item", "sk", "v").count())
    time("full dense (2nd)")(Spearman.pairCorrelationsDense(long, Seq("l_returnflag"), "item", "sk", "v").count())
    spark.stop()
  }
}
