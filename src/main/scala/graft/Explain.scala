package graft

/** Plan-audit tool: prints the formatted physical plan for queries.
  *
  *   runMain graft.Explain <queryName> [sfDir]          — one, to stdout
  *   runMain graft.Explain --dir <outDir> <sfDir> <q>...— many, to files
  *
  * Note: building a query's DataFrame executes its driver-side stages
  * (codebook fits, eager checkpoints, streaming drains), so the dumped
  * plan is the final consumer plan — checkpointed subtrees appear as
  * materialized scans, which is exactly what executes.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--dir")) {
      val outDir = args(1)
      val sfDir = args(2)
      val names = args.drop(3)
      val spark = GraftSession.getOrCreate("graft-explain")
      new java.io.File(outDir).mkdirs()
      names.foreach { name =>
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
          println(s"[explain] wrote $name")
        } catch {
          case e: Throwable => System.err.println(s"[explain] $name failed: ${e.getMessage}")
        }
      }
      spark.stop()
    } else {
      val name = args(0)
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
      val spark = GraftSession.getOrCreate("graft-explain")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      spark.stop()
    }
  }
}
