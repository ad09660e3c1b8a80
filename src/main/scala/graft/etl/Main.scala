package graft.etl

import graft.GraftSession

/** CLI entry points (reference: scripts/run_etl.py:32-41 and
  * scripts/run_correlation_job.py:29-48).
  *
  *   graft.etl.Main etl --config etl.yaml --warehouse <dir>
  *   graft.etl.Main correlate --warehouse <dir> [--study GSE1 --study GSE2 ...]
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    val cmd = args.head
    val opts = parse(args.tail.toList, Map.empty)
    val spark = GraftSession.getOrCreate(s"graft-$cmd")
    try cmd match {
      case "etl" =>
        val cfg = EtlConfig.load(opts.get("config").flatMap(_.headOption)
          .getOrElse { usage(); sys.exit(2) })
        // warehouse target: explicit flag, else the config's connection
        // string when it names a JDBC database (the reference's
        // deployment shape — database.connection_string IS the target),
        // else the local parquet default
        val wh = opts.get("warehouse").flatMap(_.headOption).getOrElse(
          if (cfg.database.connectionString.startsWith("jdbc:"))
            cfg.database.connectionString
          else "./warehouse")
        val job = new EtlJob(spark, cfg, wh)
        val mode = opts.get("mode").flatMap(_.headOption).getOrElse("sequential")
        val results = mode match {
          case "unioned"    => job.runUnioned()
          case "sequential" => job.run()
          case other =>
            System.err.println(s"Unknown --mode: $other (expected sequential|unioned)")
            usage(); sys.exit(2)
        }
        results.foreach { r =>
          val status = r.error.map(e => s"FAILED: $e").getOrElse("ok")
          println(s"study=${r.accession} samples=${r.samples} facts=${r.facts} $status")
        }
        if (results.exists(_.error.isDefined)) sys.exit(1)
      case "correlate" =>
        val wh = opts.get("warehouse").flatMap(_.headOption).getOrElse("./warehouse")
        val studies = opts.getOrElse("study", Seq.empty)
        val exactP = opts.get("exact-p").flatMap(_.headOption).exists(_.toBoolean)
        val summary = new CorrelationJob(spark, wh, exactPValues = exactP).run(studies)
        println(s"studies=${summary.studies.mkString(",")} pairs=${summary.pairs}")
      case other =>
        System.err.println(s"Unknown command: $other"); usage(); sys.exit(2)
    } finally spark.stop()
  }

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, Seq[String]]): Map[String, Seq[String]] =
    args match {
      case key :: value :: rest if key.startsWith("--") =>
        val k = key.drop(2)
        parse(rest, acc.updated(k, acc.getOrElse(k, Seq.empty) :+ value))
      case Nil => acc
      case other :: _ =>
        System.err.println(s"Unexpected argument: $other"); usage(); sys.exit(2)
    }

  private def usage(): Unit = System.err.println(
    """usage: graft.etl.Main etl --config <yaml> [--warehouse <dir|jdbc:url>] [--mode unioned]
      |       graft.etl.Main correlate [--warehouse <dir|jdbc:url>] [--study <GSE>]... [--exact-p true]""".stripMargin)
}
