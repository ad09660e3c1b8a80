package graft.tools

import graft.{GraftSession, SparkEntry}

/** Generic per-query timing probe — times any SparkEntry query in
  * isolation (fresh-session, N reps, noop sink), so a bench reading
  * polluted by suite interleaving or box co-load can be separated
  * from a real plan regression without re-running the whole suite:
  *   sbt 'Test/runMain graft.tools.ProbeQuery p13_ivf_topk,c2_spearman_pairs 3 /root/testdata/sf0.1'
  */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(Seq("c2_spearman_pairs"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("probe-query")
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/region.parquet").count() // warm the session
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n' — see SparkEntry.queries"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBEQ $n min=${times.min}%.2f max=${times.max}%.2f " +
        times.map(t => f"$t%.2f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
