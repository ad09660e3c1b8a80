package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

class ExpressionFormatError(msg: String) extends RuntimeException(msg)

/** Wide gene×sample expression matrix → long (gene, sample, value)
  * triples (reference: src/etl_for_all_studies/expression_processing.py:24-113).
  *
  * Structure checks are driver-side assertions on `df.columns` (same
  * rules): first column `gene`/`ensembl_id` case-insensitive, >= 2
  * columns, expected-from-metadata sample columns warn+drop when
  * missing / error when none remain (F2). The melt itself is Spark's
  * native `unpivot` (R1); blank genes are dropped (F3) and non-numeric
  * cells cast to null and dropped (F4 — the reference's try/float
  * semantics). The resume cursor / sample_index column is deliberately
  * not ported (SURVEY.md §7.5): idempotence comes from the fact-table
  * anti-join instead.
  *
  * Scale: unpivot is a per-row Generate — no shuffle; the downstream
  * whitelist semi-join broadcasts. A 50k-sample-wide TSV becomes 50k
  * long rows per gene, streamed through whole-stage codegen.
  */
object ExpressionMatrix {

  /** Read the TSV and melt to (gene_id, sample_accession,
    * expression_value). `expectedSamples` comes from the study's
    * metadata (gsm accessions).
    */
  def load(spark: SparkSession, path: String, expectedSamples: Seq[String]): DataFrame = {
    val raw = spark.read
      .options(Map("sep" -> "\t", "header" -> "true", "inferSchema" -> "false"))
      .csv(path)
    melt(raw, expectedSamples, context = path)
  }

  def melt(raw: DataFrame, expectedSamples: Seq[String], context: String = "<df>"): DataFrame = {
    if (expectedSamples.isEmpty)
      throw new ExpressionFormatError("No sample columns provided for expression processing")
    val headers = raw.columns.toSeq
    if (headers.size < 2)
      throw new ExpressionFormatError(
        s"Expression file $context must contain gene column and at least one sample column")
    val geneCol = headers.head
    if (!Set("gene", "ensembl_id").contains(geneCol.trim.toLowerCase))
      throw new ExpressionFormatError(
        s"Expression file $context must begin with a gene identifier column")

    val sampleHeaders = headers.tail.toSet
    val missing = expectedSamples.filterNot(sampleHeaders.contains)
    if (missing.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"Expression file $context missing expected sample columns: ${missing.sorted}")
    val kept = expectedSamples.filter(sampleHeaders.contains)
    if (kept.isEmpty)
      throw new ExpressionFormatError(
        s"Expression file $context missing all expected sample columns from metadata")

    raw
      .select((trim(col(geneCol)).as("gene_id") +: kept.map(col)): _*)
      .where(col("gene_id") =!= "") // F3
      .unpivot(Array(col("gene_id")), kept.map(col).toArray, "sample_accession", "__raw")
      .withColumn("expression_value", col("__raw").cast("double"))
      .where(col("expression_value").isNotNull) // F4: non-parsable dropped
      .drop("__raw")
  }
}
