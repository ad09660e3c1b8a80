package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Time individual queries with per-stage breakdown:
  *   runMain graft.BenchOne <sfDir> <name>...
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.getOrCreate("graft-bench-one")
    // parse once, fail fast: inside the listener a bad value would
    // throw per event and the listener bus would swallow every line
    val stageFloor = sys.env.get("BENCHONE_STAGE_FLOOR").map(_.toDouble).getOrElse(1.0)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        if (dur > stageFloor)
          println(f"  STAGE ${si.stageId}%4d ${si.numTasks}%4d tasks ${dur}%8.1f s  ${si.name.take(80)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm-up
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"BENCHONE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
