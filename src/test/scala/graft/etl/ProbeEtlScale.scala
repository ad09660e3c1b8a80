package graft.etl

import graft.GraftSession

/** 10× scale probe for the reference-parity ETL itself (round 11): the
  * headline 10× probes cover the query surface, but the unioned ETL +
  * correlation job were last measured at 4 studies / 2.4 M facts
  * (BASELINE.md "Measured"). This probe regenerates that workload
  * shape — 5,000 samples × 1,200 genes per study, 120-gene whitelist
  * (90% scan-time row cut ⇒ 600 k facts/study) — at a baseline and a
  * 10× study count on the SNAPSHOT backend, and prints facts/s plus
  * the sub-linearity ratio.
  *
  *   Test/runMain graft.etl.ProbeEtlScale [baseStudies] [scaledStudies]
  */
object ProbeEtlScale {
  private val Samples = 5000
  private val Genes = 1200
  private val Whitelist = 120

  private def fmtVal(g: Int, s: Int, study: Int): String = {
    val v = (g * 31 + s * 7 + study * 13) % 97
    s"${v / 10}.${v % 10}"
  }

  /** One study directory in the reference layout: metadata TSV (GSM
    * rows) + wide expression TSV. ~24 MB of text per study, written
    * buffered; studies generate in parallel threads (pure text I/O).
    */
  private def writeStudy(root: java.nio.file.Path, idx: Int): Unit = {
    val gse = f"GSE9$idx%04d"
    val dir = java.nio.file.Files.createDirectories(root.resolve(gse))
    val meta = new java.io.BufferedWriter(new java.io.FileWriter(
      dir.resolve(s"metadata_$gse.tsv").toFile), 1 << 20)
    meta.write("refinebio_accession_code\texperiment_accession\trefinebio_age\t" +
      "refinebio_sex\trefinebio_platform\tcharacteristics_ch2_illness\n")
    var s = 0
    while (s < Samples) {
      val illness = if (s % 2 == 0) "Healthy" else "Diabetes"
      val sex = if (s % 3 == 0) "male" else "female"
      meta.write(s"GSM${idx}_$s\t$gse\t${20 + s % 60}\t$sex\tGPL96\t$illness\n")
      s += 1
    }
    meta.close()
    val expr = new java.io.BufferedWriter(new java.io.FileWriter(
      dir.resolve(s"expression_$gse.tsv").toFile), 1 << 20)
    expr.write((Seq("gene") ++ (0 until Samples).map(s0 => s"GSM${idx}_$s0"))
      .mkString("\t"))
    expr.write("\n")
    var g = 0
    while (g < Genes) {
      val sb = new java.lang.StringBuilder(Samples * 5 + 16)
      sb.append(f"ENSG$g%06d")
      var s0 = 0
      while (s0 < Samples) {
        sb.append('\t').append(fmtVal(g, s0, idx))
        s0 += 1
      }
      sb.append('\n')
      expr.write(sb.toString)
      g += 1
    }
    expr.close()
  }

  private def makeFixture(root: java.nio.file.Path, n: Int): java.nio.file.Path = {
    val filter = root.resolve("gene_filter.tsv")
    if (!java.nio.file.Files.exists(filter)) {
      java.nio.file.Files.writeString(filter,
        "ensembl_id\n" + (0 until Whitelist).map(g => f"ENSG${g * 10}%06d")
          .mkString("\n") + "\n")
    }
    val studies = root.resolve(s"studies_$n")
    if (!java.nio.file.Files.exists(studies)) {
      java.nio.file.Files.createDirectories(studies)
      val t0 = System.nanoTime()
      // parallel text I/O without the (absent) parallel-collections
      // module: a fixed thread pool over study indices
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        (0 until n).map { i =>
          pool.submit(new Runnable { def run(): Unit = writeStudy(studies, i) })
        }.foreach(_.get())
      } finally pool.shutdown()
      println(f"etl-scale-probe: generated $n studies in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    studies
  }

  private def runOnce(spark: org.apache.spark.sql.SparkSession,
      root: java.nio.file.Path, n: Int): (Double, Long, Double) = {
    val studies = makeFixture(root, n)
    val whDir = java.nio.file.Files.createTempDirectory("graft_etl_scale_wh")
    val cfg = AppConfig(DatabaseConfig("unused"),
      ProcessingConfig(studies, root.resolve("gene_filter.tsv")),
      LoggingConfig(logLevel = "WARN"))
    val job = new EtlJob(spark, cfg, s"snapshot:$whDir")
    val dirs = StudyDiscovery.discoverStudyDirs(studies)
    val t0 = System.nanoTime()
    job.processUnioned(dirs)
    val etlSecs = (System.nanoTime() - t0) / 1e9
    val facts = Warehouse(spark, s"snapshot:$whDir").read("fact_expression").count()
    val t1 = System.nanoTime()
    new CorrelationJob(spark, s"snapshot:$whDir").run()
    val corrSecs = (System.nanoTime() - t1) / 1e9
    println(f"etl-scale-probe: n=$n unioned ETL $etlSecs%.1f s, " +
      f"$facts facts (${facts / etlSecs}%.0f facts/s); correlation $corrSecs%.1f s")
    (etlSecs, facts, corrSecs)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toInt).getOrElse(4)
    val scaled = if (args.length > 1) args(1).toInt else 40
    val spark = GraftSession.getOrCreate("graft-probe-etl-scale")
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Paths.get("/tmp/graft_etl_scale")
    java.nio.file.Files.createDirectories(root)
    val (bt, bf, bc) = runOnce(spark, root, base)
    val (st, sf, sc) = runOnce(spark, root, scaled)
    val ratio = (st / bt) / (sf.toDouble / bf)
    println(f"etl-scale-probe: ${scaled / base}x studies -> ETL time ${st / bt}%.2fx, " +
      f"facts ${sf.toDouble / bf}%.1fx, per-fact ratio $ratio%.2f (sub-linear < 1), " +
      f"correlation ${sc / bc}%.2fx")
    spark.stop()
  }
}
