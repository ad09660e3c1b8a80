package graft

import graft.stats.Spearman
import org.apache.spark.sql.functions._

/** Wide-vs-join crossover measurement for the dense Spearman path
  * (VERDICT round-2 #6):
  *
  *   Test/runMain graft.ProbeWideCrossover [whDir] [itemCounts,...]
  *
  * For each item count I, restricts the scale warehouse's long form to
  * the first I genes and times the dense path with the wide plan forced
  * (wideLimit >= I) vs the join plan forced (wideLimit = 0). Output
  * feeds the WideItemLimit default and BASELINE.md's measured table.
  */
object ProbeWideCrossover {
  def main(args: Array[String]): Unit = {
    // each entry is I or I:mode with mode in {both, wide, join} —
    // lets the caller skip the wide plan where it is known pathological
    // (I=120 wide is hours at this fixture)
    val wh = args.headOption.getOrElse("/tmp/scale_study/wh")
    val counts = (if (args.length > 1) args(1) else "8,16,32,64,120:join")
      .split(",").map(_.trim).map { e =>
        e.split(":") match {
          case Array(i)    => (i.toInt, "both")
          case Array(i, m) => (i.toInt, m)
        }
      }.toSeq
    val spark = GraftSession.getOrCreate("graft-probe-crossover")
    spark.sparkContext.setLogLevel("WARN")
    val facts = spark.read.parquet(s"$wh/fact_expression")
    val dimSample = spark.read.parquet(s"$wh/dim_sample")
      .select("sample_key", "gsm_accession")
    val long = facts.join(broadcast(dimSample), Seq("sample_key"))
      .select(col("study_key"), col("gene_key"), col("gsm_accession"),
        col("expression_value"))

    def time(name: String)(f: => Long): Unit =
      try {
        val t0 = System.nanoTime()
        val n = f
        println(f"CROSSOVER $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      } catch {
        case e: Throwable =>
          println(s"CROSSOVER $name FAILED: ${e.getClass.getSimpleName} ${e.getMessage}")
      }

    counts.foreach { case (i, mode) =>
      val subset = long.where(col("gene_key") <= i).localCheckpoint(true)
      if (mode == "both" || mode == "wide")
        time(s"I=$i wide")(Spearman.pairCorrelationsDense(subset, Seq("study_key"),
          "gene_key", "gsm_accession", "expression_value", wideLimit = i).count())
      if (mode == "both" || mode == "join")
        time(s"I=$i join")(Spearman.pairCorrelationsDense(subset, Seq("study_key"),
          "gene_key", "gsm_accession", "expression_value", wideLimit = 0).count())
    }
    spark.stop()
  }
}
