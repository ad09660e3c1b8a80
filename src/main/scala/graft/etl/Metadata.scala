package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

class MetadataFormatError(msg: String) extends RuntimeException(msg)

/** Metadata TSV normalization (reference: src/etl_for_all_studies/
  * metadata_processing.py:45-168).
  *
  * Header resolution is *driver-side* against `df.columns` — the same
  * 3-tier candidate matching as the reference (exact, case-insensitive,
  * digit-stripped-normalized, metadata_processing.py:45-102) compiled
  * into one `coalesce(...)` projection per logical field, so the
  * per-row work stays columnar/codegen'd (SURVEY.md §1.3).
  *
  * Row semantics preserved exactly:
  *  - required columns refinebio_accession_code + experiment_accession
  *    (else MetadataFormatError);
  *  - rows with blank GSM are dropped (F5);
  *  - a field is the first non-blank value over its candidates, where
  *    an exact-header candidate does NOT fall through to other headers
  *    (only to the next candidate), while non-exact candidates take the
  *    first non-blank among case-insensitive matches then normalized
  *    matches in column order;
  *  - everything unresolved becomes the string "UNKNOWN".
  */
object Metadata {
  import Schema.UnknownValue

  private[etl] def normalizeHeader(name: String): String =
    name.replaceAll("\\d+", "").trim.toLowerCase

  /** Ordered header list matched by one candidate (3-tier rules). */
  private[etl] def candidateHeaders(cand: String, headers: Seq[String]): Seq[String] =
    if (cand.isEmpty) Seq.empty
    else if (headers.contains(cand)) Seq(cand)
    else if (headers.contains(cand.trim)) Seq(cand.trim)
    else {
      val cf = headers.filter(_.toLowerCase == cand.toLowerCase)
      val nm = headers.filter(h => normalizeHeader(h) == normalizeHeader(cand))
      cf ++ nm.filterNot(cf.contains)
    }

  private def nonBlank(h: String): Column = {
    val v = trim(col(h))
    when(v =!= "", v)
  }

  /** First non-blank value across candidates, else UNKNOWN. */
  private[etl] def resolveField(headers: Seq[String], candidates: Seq[String]): Column = {
    val exprs = candidates.flatMap(c => candidateHeaders(c, headers)).map(nonBlank)
    if (exprs.isEmpty) lit(UnknownValue)
    else coalesce((exprs :+ lit(UnknownValue)): _*)
  }

  /** Read + normalize one metadata TSV to SampleMetadata shape. */
  def load(spark: SparkSession, path: String, mappings: FieldMappingConfig,
      enforceRequired: Boolean = true): DataFrame = {
    val raw = spark.read
      .options(Map("sep" -> "\t", "header" -> "true", "inferSchema" -> "false"))
      .csv(path)
    normalize(raw, mappings, enforceRequired, context = path)
  }

  /** Normalize an already-read all-strings metadata DataFrame. */
  def normalize(raw: DataFrame, mappings: FieldMappingConfig,
      enforceRequired: Boolean = true, context: String = "<df>"): DataFrame = {
    val headers = raw.columns.toSeq
    val required = Seq("refinebio_accession_code", "experiment_accession")
    val missing = required.filterNot(headers.contains)
    if (enforceRequired && missing.nonEmpty)
      throw new MetadataFormatError(
        s"Metadata file $context missing required columns: ${missing.sorted.mkString("[", ", ", "]")}")

    def colOr(h: String): Column =
      if (headers.contains(h)) trim(col(h)) else lit("")

    raw.select(
        colOr("refinebio_accession_code").as("gsm_accession"),
        coalesce(when(colOr("experiment_accession") =!= "",
          colOr("experiment_accession")), lit(UnknownValue)).as("study_accession"),
        resolveField(headers, mappings.platformFields).as("platform_accession"),
        resolveField(headers, mappings.illnessFields).as("illness_label"),
        resolveField(headers, mappings.ageFields).as("age"),
        resolveField(headers, mappings.sexFields).as("sex"))
      .where(col("gsm_accession") =!= "") // F5: blank-GSM rows dropped
  }

  /** Per-study metadata quality aggregate (A1, metadata_processing.py:26-38). */
  def quality(samples: DataFrame): DataFrame =
    samples.agg(
      count(lit(1)).as("total_samples"),
      sum(when(col("age") =!= UnknownValue, 1L).otherwise(0L)).as("complete_age"),
      sum(when(col("sex") =!= UnknownValue, 1L).otherwise(0L)).as("complete_sex"))

  /** X6: samples referencing a different experiment accession are
    * forced to the directory-derived study (pipeline.py:131-139);
    * returns the overridden frame (the caller logs the mismatch count).
    */
  def overrideStudyAccession(samples: DataFrame, accession: String): DataFrame =
    samples.withColumn("study_accession", lit(accession))

  def mismatchCount(samples: DataFrame, accession: String): Long =
    samples.where(col("study_accession") =!= accession &&
      col("study_accession") =!= UnknownValue).count()
}
