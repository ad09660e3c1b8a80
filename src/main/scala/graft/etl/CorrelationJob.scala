package graft.etl

import graft.stats.{BenjaminiHochberg, PValues, Spearman}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-study all-pairs Spearman + BH analytics job (reference:
  * scripts/run_correlation_job.py → src/etl_for_all_studies/
  * correlation_job.py:49-238 + correlation.py:95-162; SURVEY.md §3.2).
  *
  * One distributed plan covers ALL target studies at once — study_key
  * is just another grouping column (the reference loops studies
  * sequentially; SURVEY.md §2.10 X1 maps that to data parallelism):
  *
  *   fact ⋈ dim_sample (J1, broadcast) → pair self-join + shared-sample
  *   intersection (J5/J6) → per-pair fractional ranks + corr (C1/C2/A4)
  *   → p-values (C3, erf approx) → per-study BH (C5) → assembly with
  *   the reference's persist-time NaN policy (C4: null p stored as 1.0,
  *   q null when p invalid) → dynamic partition overwrite (S7 replace).
  */
/** @param exactPValues opt-in exact Student-t p-values (the reference's
  *   scipy primary path, correlation.py:11-12); the default stays the
  *   normal approximation the cross-engine oracle pins
  *   (correlation.py:50-61, SURVEY.md §7.4.2).
  * @param useBucketedFacts read facts from the bucketed catalog table
  *   written by [[CorrelationJob.bucketizeFacts]] — the scan then
  *   arrives hash-partitioned by `gene_key`, which satisfies the dense
  *   path's (study, gene) rank-window distribution, so the window's
  *   Exchange of ALL fact rows disappears (the first and largest
  *   shuffle of the dense plan; pinned by BucketingSpec). At 100 TB the
  *   bucketize is paid once per warehouse load, the rank shuffle once
  *   per correlation run.
  */
class CorrelationJob(spark: SparkSession, warehouseDir: String,
    exactPValues: Boolean = false, useBucketedFacts: Boolean = false) {
  import CorrelationJob.BucketedFactsTable
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val wh = Warehouse(spark, warehouseDir)

  private def factSource(): DataFrame =
    if (useBucketedFacts) spark.table(BucketedFactsTable)
    else wh.read("fact_expression")

  /** F7 study-filtered facts. On the snapshot backend the predicate
    * ALSO prunes at manifest resolution (whole segments whose stamped
    * study set cannot match are skipped before any footer listing —
    * [[SnapshotWarehouse.readStudies]]); every backend still pushes
    * it as a hive partition filter at the scan.
    */
  private def factsForStudies(studyKeys: Seq[Long]): DataFrame = wh match {
    case sw: SnapshotWarehouse if !useBucketedFacts =>
      sw.readStudies("fact_expression", studyKeys)
    case _ =>
      factSource().where(col("study_key").isin(studyKeys: _*)) // partition pruning
  }

  /** J2 + F6 + O6: studies having >= 1 expression fact, optionally
    * restricted to the requested accessions (order-preserving dedup of
    * the request is the caller's list semantics; missing ones warned).
    */
  def resolveTargetStudies(requested: Seq[String]): DataFrame = {
    val dimStudy = wh.read("dim_study")
    val withFacts = dimStudy.join(
      wh.read("fact_expression").select("study_key"), Seq("study_key"), "left_semi")
    val target =
      if (requested.isEmpty) withFacts
      else {
        val req = requested.distinct
        val found = withFacts.where(col("gse_accession").isin(req: _*))
        val foundAcc = found.select("gse_accession").collect().map(_.getString(0)).toSet
        val missing = req.filterNot(foundAcc.contains)
        if (missing.nonEmpty)
          log.warn(s"Requested studies without expression data: ${missing.sorted.mkString(", ")}")
        found
      }
    target.orderBy("gse_accession") // O3
  }

  /** The analytical core as one DataFrame, pairs keyed and gated. */
  def correlationsFor(studyKeys: Seq[Long], computedAt: String,
      minSamples: Int = 2): DataFrame = {
    val facts = factsForStudies(studyKeys)
    val dimSample = wh.read("dim_sample").select("sample_key", "gsm_accession")
    val long = facts.join(broadcast(dimSample), Seq("sample_key")) // J1
      .select(col("study_key"), col("gene_key"), col("gsm_accession"), col("expression_value"))

    // Per-study path choice: a COMPLETE matrix (every gene observed on
    // every sample — facts are unique on (sample, gene, study), so
    // complete ⟺ rows = genes × samples) lets the dense path rank once
    // per gene instead of once per pair: O(G·n) window work instead of
    // O(G²·n), identical output (ranks over shared samples equal global
    // ranks when nothing is missing; pinned by StatsSpec). Incomplete
    // studies take the exact shared-sample path. The per-study stats
    // are a metrics-scale driver collect, not a data collect.
    val shape = long.groupBy("study_key").agg(
      countDistinct("gene_key").as("g"),
      countDistinct("gsm_accession").as("s"),
      count(lit(1)).as("n")).collect()
    // study_key arrives as IntegerType when read back off hive-style
    // partition directories — go through Number, not a fixed cast
    def asLong(r: org.apache.spark.sql.Row, c: String): Long =
      r.getAs[Number](c).longValue()
    val (completeKeys, sparseKeys) = shape.partition(r =>
      asLong(r, "n") == asLong(r, "g") * asLong(r, "s"))
    def run(keys: Array[Long], dense: Boolean): Option[DataFrame] =
      if (keys.isEmpty) None
      else {
        val subset = long.where(col("study_key").isin(keys: _*))
        Some(
          if (dense) Spearman.pairCorrelationsDense(subset, Seq("study_key"),
            "gene_key", "gsm_accession", "expression_value", minSamples)
          else Spearman.pairCorrelations(subset, Seq("study_key"),
            "gene_key", "gsm_accession", "expression_value", minSamples))
      }
    val pairs = Seq(
      run(completeKeys.map(asLong(_, "study_key")), dense = true),
      run(sparseKeys.map(asLong(_, "study_key")), dense = false))
      .flatten.reduceOption(_ unionByName _)
      // no facts at all: empty-but-correctly-shaped result
      .getOrElse(Spearman.pairCorrelations(long, Seq("study_key"),
        "gene_key", "gsm_accession", "expression_value", minSamples))
      .withColumnRenamed("item_a", "gene_a_key")
      .withColumnRenamed("item_b", "gene_b_key")

    val withP = pairs.withColumn("p_raw",
      if (exactPValues) PValues.spearmanPExact(col("rho"), col("n_samples"))
      else PValues.spearmanP(col("rho"), col("n_samples")))
    val withQ = BenjaminiHochberg.qValues(withP, Seq(col("study_key")), col("p_raw"), "q_value")

    withQ.select(
      col("gene_a_key"), col("gene_b_key"),
      lit(null).cast("long").as("illness_key"), // always null (correlation.py:109,153)
      col("rho").as("rho_spearman"),
      coalesce(col("p_raw"), lit(1.0)).as("p_value"), // C4 persist policy
      col("q_value"),
      col("n_samples"),
      lit(computedAt).as("computed_at"),
      col("study_key"))
  }

  case class JobSummary(studies: Seq[String], pairs: Long)

  /** Run for the requested studies (all, when empty) and replace their
    * correlation partitions.
    */
  def run(requested: Seq[String] = Seq.empty): JobSummary = {
    val targets = resolveTargetStudies(requested).collect()
    if (targets.isEmpty) return JobSummary(Seq.empty, 0L)
    val keys = targets.map(_.getAs[Long]("study_key")).toSeq
    // matches Python's datetime.isoformat(timespec="seconds"): +00:00, not Z
    val computedAt = java.time.OffsetDateTime.now(java.time.ZoneOffset.UTC)
      .truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssxxx"))
    val out = correlationsFor(keys, computedAt).cache()
    val n = out.count()
    // explicit delete-then-append over the RESOLVED keys: a study whose
    // recomputation is empty must still lose its stale rows (dynamic
    // partition overwrite only touches partitions present in the frame)
    wh.replaceStudyPartitions("fact_gene_pair_corr", out, keys)
    out.unpersist()
    JobSummary(targets.map(_.getAs[String]("gse_accession")).toSeq, n)
  }
}

object CorrelationJob {

  /** Catalog name of the bucketed fact twin (bucketed layout needs the
    * session catalog — see [[ParquetWarehouse.writeBucketed]]).
    */
  val BucketedFactsTable = "fact_expression_bucketed"

  /** One-time (per warehouse load) re-layout of `fact_expression` into
    * a catalog table bucketed by `gene_key` and partitioned by
    * `study_key` — study pruning is preserved, and every correlation
    * run over it skips the dense path's rank-window Exchange because
    * the scan is already hash-partitioned on a subset of the window's
    * (study, gene) keys. Parquet warehouses only: bucketing is a file
    * layout, meaningless over JDBC.
    */
  def bucketizeFacts(spark: SparkSession, warehouseDir: String,
      buckets: Int = 32): Unit = {
    val wh = Warehouse(spark, warehouseDir) match {
      case p: ParquetWarehouse => p
      case _ => throw new IllegalArgumentException(
        "bucketizeFacts requires a parquet warehouse (bucketing is file layout)")
    }
    wh.writeBucketed(BucketedFactsTable, wh.read("fact_expression"),
      bucketCol = "gene_key", buckets = buckets,
      partitionCols = Seq("study_key"))
  }
}
