package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

class GeneFilterError(msg: String) extends RuntimeException(msg)

/** Gene whitelist loading + the scan-time semi-join filter (reference:
  * src/etl_for_all_studies/gene_filter.py:12-28 and
  * expression_processing.py:83-84; REQ-002 ~99% row reduction).
  *
  * The whitelist is tiny (~120 genes) so the filter is applied as a
  * broadcast left-semi join — Catalyst pushes it below the unpivot so
  * non-whitelisted genes are dropped before the melt multiplies rows.
  */
object GeneFilter {

  /** Distinct trimmed non-empty ensembl ids; errors mirror the reference. */
  def load(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.options(Map("sep" -> "\t", "header" -> "true")).csv(path)
    if (!df.columns.contains("ensembl_id"))
      throw new GeneFilterError(
        s"Gene filter file $path must include an 'ensembl_id' column")
    val genes = df.select(trim(col("ensembl_id")).as("ensembl_id"))
      .where(length(col("ensembl_id")) > 0)
      .distinct()
    if (genes.limit(1).count() == 0)
      throw new GeneFilterError(
        s"Gene filter file $path did not contain any gene identifiers")
    genes
  }

  /** Scan-time whitelist filter (F1): broadcast semi join on gene id. */
  def filterGenes(expr: DataFrame, genes: DataFrame, geneCol: String): DataFrame =
    expr.join(broadcast(genes.withColumnRenamed("ensembl_id", geneCol)),
      Seq(geneCol), "left_semi")
}
