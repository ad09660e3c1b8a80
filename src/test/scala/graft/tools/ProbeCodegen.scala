package graft.tools

/** Seed/refresh the CodegenTripwireSpec ratchet table: print, for each
  * gated query, the count of NON-codegen (bare) Project/Filter nodes
  * in the FINAL executed plan at the given sf dir.
  *
  *   sbt "Test/runMain graft.tools.ProbeCodegen /root/testdata/sf0.001"
  */
object ProbeCodegen {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.getOrCreate("graft-probe-codegen")
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.CodegenAudit.GatedQueries.foreach { name =>
      val counts = graft.plans.CodegenAudit.bareCounts(spark, sfDir, name)
      println(s"""PROBE "$name" -> ${counts.bareProjects + counts.bareFilters}, // bareP=${counts.bareProjects} bareF=${counts.bareFilters}""")
    }
    spark.stop()
  }
}
