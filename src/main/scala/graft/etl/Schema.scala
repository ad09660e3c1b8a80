package graft.etl

/** Star-schema case classes — the warehouse contract.
  *
  * Mirrors the reference DDL (reference: src/etl_for_all_studies/
  * models.py:15-131; SURVEY.md §1.4). Age/sex are deliberately strings
  * with "UNKNOWN" as a value (models.py:63-64) — not numerics, not
  * nulls; platform/illness UNKNOWN becomes a NULL foreign key instead
  * (repositories.py:149-150,163-164).
  */
object Schema {
  val UnknownValue = "UNKNOWN"

  case class DimGene(gene_key: Long, ensembl_id: String)
  case class DimStudy(study_key: Long, gse_accession: String)
  case class DimIllness(illness_key: Long, illness_label: String)
  case class DimPlatform(platform_key: Long, platform_accession: String)
  case class DimSample(
      sample_key: Long,
      gsm_accession: String,
      study_key: Long,
      platform_key: Option[Long],
      illness_key: Option[Long],
      age: String,
      sex: String)
  case class FactExpression(
      sample_key: Long,
      gene_key: Long,
      study_key: Long,
      expression_value: Double)
  case class FactGenePairCorrelation(
      gene_a_key: Long,
      gene_b_key: Long,
      illness_key: Option[Long],
      rho_spearman: Double,
      p_value: Double,
      q_value: Option[Double],
      n_samples: Long,
      computed_at: String,
      study_key: Long)

  /** Normalized per-sample metadata record (metadata_processing.py:16-23). */
  case class SampleMetadata(
      gsm_accession: String,
      study_accession: String,
      platform_accession: String,
      illness_label: String,
      age: String,
      sex: String)
}
