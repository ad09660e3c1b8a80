package graft

/** Replicates the driver's flagship smoke check: SparkEntry.entry
  * must return rows on sf0.001. Run: runMain graft.EntrySmoke
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("graft-entry-smoke")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY rows=$n")
    require(n > 0, "flagship entry() returned no rows")
    spark.stop()
  }
}
