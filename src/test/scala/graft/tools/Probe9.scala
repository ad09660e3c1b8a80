package graft.tools

import graft.GraftSession
import graft.ops.AsOfJoin

/** Debug the multi-key as-of exec case. */
object Probe9 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("probe9")
    import spark.implicits._
    val left = Seq((1L, "a", 1L, 20L), (2L, "a", 2L, 20L), (3L, "b", 1L, 20L))
      .toDF("id", "k1", "k2", "t")
    val right = Seq(
      ("a", 1L, 10L, Some(1.0), "x"),
      ("a", 1L, 15L, None, "y"),
      ("b", 9L, 5L, Some(3.0), "z")
    ).toDF("k1", "k2", "t", "rv", "tag")
    val df = AsOfJoin.asofMerged(left, right, Seq("k1", "k2"), "t", Seq("rv", "tag"))
    df.explain("formatted")
    df.show()
    spark.stop()
  }
}
