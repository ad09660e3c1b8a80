package graft

import scala.util.control.NonFatal

/** Per-query bench REGRESSION GATE (round 13).
  *
  * BENCH_rN totals cannot catch a real single-query regression:
  * identical-code 3-pass runs swung 251–310 s across round 12 (up to
  * 24%), so a 1.5× regression on one mid-sized query drowns in the
  * total's noise. This gate compares each benched query's min-of-3
  * against a CHECKED-IN per-query ceiling ([[BenchCeilings]], seeded
  * from BENCHDETAIL_r12 min-of-12 × 1.8 + 0.3 s — headroom above the
  * measured per-query noise band, far below a real 2×+ plan
  * regression like the p36 interpreted-lambda incident or the a6
  * fused-countDistinct incident, both >4×) and FAILS LOUDLY (exit 1,
  * per-query lines) on any query over ceiling.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.BenchGate"
  *
  * Ceilings are sf0.1 numbers — the gate refuses to run against any
  * other scale rather than emit meaningless verdicts. A benched query
  * with no ceiling is a FAILURE too (BenchGateSpec pins the name sets,
  * so a new query cannot dodge the gate silently): seed it with a
  * measured min before shipping. Last line of stdout is one JSON
  * summary (the Bench artifact discipline).
  */
object BenchGate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // exact trailing path segment — substring matching would accept
    // sf0.15/sf0.125 and gate against the wrong scale (round-13 ADVICE)
    if (sfDir.replaceAll("/+$", "").split('/').last != "sf0.1") {
      System.err.println(s"[bench-gate] ceilings are sf0.1 numbers; refusing to gate against $sfDir")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-bench-gate", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm-up
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch {
        case NonFatal(e) =>
          System.err.println(s"[bench-gate] $name failed: ${e.getMessage}")
          return Double.MaxValue
      }
      (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.benchQueries
    val passes = 3
    val mins = (1 to passes).map(_ => names.map(n => n -> once(n)).toMap)
      .reduce((a, b) => a.map { case (k, v) => k -> math.min(v, b(k)) })
    val unseeded = names.filterNot(BenchCeilings.ceilings.contains)
    val over = names.flatMap { n =>
      BenchCeilings.ceilings.get(n).collect {
        case c if mins(n) > c => (n, mins(n), c)
      }
    }
    over.foreach { case (n, got, c) =>
      println(f"OVER-CEILING $n%-28s min-of-$passes ${got}%7.3f s > ceiling $c%6.2f s")
    }
    unseeded.foreach(n => println(s"UNSEEDED     $n (benched but no ceiling — seed it)"))
    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val overJson = over.map { case (n, got, c) =>
      s"""{"q":${JsonUtil.quote(n)},"min":${fmt(got)},"ceiling":${fmt(c)}}"""
    }.mkString("[", ",", "]")
    val line =
      s"""{"metric":"bench_gate","n":${names.size},"over":${over.size},"unseeded":${unseeded.size},""" +
        s""""over_detail":$overJson,"sf":${JsonUtil.quote(sfDir)}}"""
    // the artifact carries the per-query mins too (stdout stays short —
    // the Bench tail-capture discipline): every gate run then doubles
    // as a 3-pass bench detail for cross-round min-merging
    val qs = names.map(n => JsonUtil.quote(n) + ":" + fmt(mins(n)))
      .mkString("{", ",", "}")
    val full = line.dropRight(1) + s""","passes":$passes,"queries":$qs}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_gate.json"),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case NonFatal(e) => System.err.println(s"[bench-gate] artifact write failed: ${e.getMessage}") }
    try spark.stop() catch { case NonFatal(_) => () }
    println(line)
    Console.out.flush()
    if (over.nonEmpty || unseeded.nonEmpty) sys.exit(1)
  }
}
