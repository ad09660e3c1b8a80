package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Boundary semantics of session_window at EXACTLY the gap: does an
  * event arriving precisely 30 minutes after the previous one merge
  * into its session or start a new one?
  */
object Probe6c {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("probe6c")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = 1754954096000000L
    for (gapUs <- Seq(1800000000L - 1, 1800000000L, 1800000000L + 1)) {
      val df = Seq((1L, base), (1L, base + gapUs)).toDF("user_id", "us")
        .select(col("user_id"), timestamp_micros(col("us")).as("ts_t"))
      val n = df.groupBy(col("user_id"), session_window(col("ts_t"), "30 minutes"))
        .agg(count(lit(1))).count()
      println(s"PROBE6C gapUs=$gapUs sessions=$n")
    }
    spark.stop()
  }
}
