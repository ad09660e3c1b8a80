package graft

import graft.stats.Spearman
import org.apache.spark.sql.functions._

/** Scale-fixture probe for the exact Spearman plans:
  *   Test/runMain graft.ProbeSpearman [agg|win|both] [whDir]
  * Forces the EXACT shared-sample path (typed-aggregate vs windowed)
  * on the 4-study /tmp/scale_study warehouse (7,140 pairs × 5,000
  * samples per study = 35.7 M pair-rows per study) regardless of
  * matrix completeness, and reports wall seconds per plan.
  */
object ProbeSpearman {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("both")
    val wh = if (args.length > 1) args(1) else "/tmp/scale_study/wh"
    val spark = GraftSession.getOrCreate("graft-probe-spearman")
    val facts = spark.read.parquet(s"$wh/fact_expression")
    val dimSample = spark.read.parquet(s"$wh/dim_sample")
      .select("sample_key", "gsm_accession")
    val long = facts.join(broadcast(dimSample), Seq("sample_key"))
      .select(col("study_key"), col("gene_key"), col("gsm_accession"), col("expression_value"))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n rows")
    }
    if (mode == "agg" || mode == "both")
      time("exact-typed-agg")(Spearman.pairCorrelations(
        long, Seq("study_key"), "gene_key", "gsm_accession", "expression_value").count())
    if (mode == "dense" || mode == "both")
      time("dense-join-path")(Spearman.pairCorrelationsDense(
        long, Seq("study_key"), "gene_key", "gsm_accession", "expression_value").count())
    if (mode == "win" || mode == "both")
      time("exact-windowed")(Spearman.pairCorrelationsWindowed(
        long, Seq("study_key"), "gene_key", "gsm_accession", "expression_value").count())
    spark.stop()
  }
}
