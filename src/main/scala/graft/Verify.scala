package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Runs on the SAME engine config as Bench (GraftSession.builder) so
  * correctness is verified under the configuration being benchmarked —
  * hand-rolled configs here had already drifted (AQE off vs on).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(s, o)       => (s, o, None)
      // optional third arg: comma-separated query names, for fast
      // local iteration on a subset (the driver always passes two)
      case Array(s, o, sub)  => (s, o, Some(sub.split(',').toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder("graft-verify", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // repartition(1), NEVER coalesce(1): coalesce collapses the
      // final stage to one task all the way down to the nearest
      // exchange — measured 165 s -> 13 min on p2 at sf0.1, whose
      // 6M-group verification reduce and gate joins all serialized
      // into the single write task. repartition inserts its own
      // exchange, so upstream stages keep their parallelism and only
      // the (result-sized) write is single-task.
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a stale result from a PRIOR run must not be scored as this
        // run's output: plan-time failures throw before the overwrite
        // deletes anything, so delete explicitly
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(s"$outDir/$name"))
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonUtil.quote(k)}: ${JsonUtil.quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
