package graft.tools

import graft.GraftSession
import graft.ops.AsOfJoin

/** Print the asofBoth physical plan (exchange-count investigation). */
object Probe8 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("probe8")
    import spark.implicits._
    val left = Seq((1L, "u1", 5L), (2L, "u1", 10L)).toDF("id", "key", "t")
    val right = Seq(("u1", 10L, 100.0)).toDF("key", "t", "rv")
    val both = AsOfJoin.asofBoth(left, right, Seq("key"), "t", Seq("rv"))
    both.explain("formatted")
    spark.stop()
  }
}
