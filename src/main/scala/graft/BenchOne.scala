package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Time individual queries with per-stage breakdown:
  *   runMain graft.BenchOne <sfDir> <name>...
  *
  * Env knobs:
  *   BENCHONE_STAGE_FLOOR — only print stages longer than this (s, default 1.0)
  *   BENCHONE_PASSES      — run each query this many times (default 1); the
  *                          per-query counter summary is printed per pass, so
  *                          pass 2+ shows the steady state without first-run
  *                          codegen/JIT noise.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val passes = sys.env.get("BENCHONE_PASSES").map(_.toInt).getOrElse(1)
    val spark = GraftSession.getOrCreate("graft-bench-one")
    // parse once, fail fast: inside the listener a bad value would
    // throw per event and the listener bus would swallow every line
    val stageFloor = sys.env.get("BENCHONE_STAGE_FLOOR").map(_.toDouble).getOrElse(1.0)
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val stageMillis = new AtomicLong(0L)
    // BENCHONE_JOB_TRACE=1: per-job line with the idle gap since the
    // previous job ended (driver-side planning/collect time between jobs)
    val jobTrace = sys.env.contains("BENCHONE_JOB_TRACE")
    val lastJobEnd = new AtomicLong(0L)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (jobTrace) {
          jobStarts.put(j.jobId, j.time)
          val gap = if (lastJobEnd.get == 0L) 0L else j.time - lastJobEnd.get
          println(f"  JOB ${j.jobId}%4d start gap=${gap}%5d ms  ${j.properties.getProperty("spark.job.description", j.stageInfos.headOption.map(_.name).getOrElse("")).take(90)}")
        }
        ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        if (jobTrace) {
          lastJobEnd.set(j.time)
          val dur = Option(jobStarts.get(j.jobId)).map(s => j.time - s).getOrElse(-1L)
          println(f"  JOB ${j.jobId}%4d end   dur=${dur}%5d ms")
        }
        ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        stages.incrementAndGet()
        tasks.addAndGet(si.numTasks)
        stageMillis.addAndGet((dur * 1000).toLong)
        if (dur > stageFloor)
          println(f"  STAGE ${si.stageId}%4d ${si.numTasks}%4d tasks ${dur}%8.1f s  ${si.name.take(80)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm-up
    args.tail.foreach { name =>
      (1 to passes).foreach { p =>
        jobs.set(0); stages.set(0); tasks.set(0); stageMillis.set(0L)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a beat before reading counters
        Thread.sleep(200)
        println(f"BENCHONE $name pass=$p $wall%.2f s  jobs=${jobs.get}%d stages=${stages.get}%d tasks=${tasks.get}%d stage_time=${stageMillis.get / 1000.0}%.2f s")
      }
    }
    spark.stop()
  }
}
