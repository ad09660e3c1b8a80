package graft
import scala.util.control.NonFatal

/** Benchmark main: one JSON metric line over SparkEntry.benchQueries.
  * Same engine config as Verify (GraftSession.builder).
  */
object Bench {
  /** A failed query must read as a regression, not a speedup: without
    * the sentinel, a plan-time exception takes ~50 ms and min-of-two
    * would report the broken query as the fastest in the suite.
    */
  private val FailureSentinelSec = 1e6

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-bench", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one warm-up action so JVM/classloader startup isn't billed to the
    // first query
    spark.read.parquet(s"$sfDir/region.parquet").count()
    def once(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch {
        case NonFatal(e) =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return FailureSentinelSec
      }
      (System.nanoTime() - t0) / 1e9
    }
    // Two passes, min per query: single-shot numbers at this scale are
    // dominated by first-run codegen compilation + C2 JIT of each
    // query's unique generated classes (measured 2-3x run-to-run noise);
    // the min is the steady-state cost of the plan itself.
    val pass1 = SparkEntry.benchQueries.map(n => n -> once(n))
    val results = pass1.map { case (n, t1) => n -> math.min(t1, once(n)) }
    val qs = results.map { case (k, v) => JsonUtil.quote(k) + ":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","passes":2,"queries":$qs,"sf":${JsonUtil.quote(sfDir)}}""")
    spark.stop()
  }
}
