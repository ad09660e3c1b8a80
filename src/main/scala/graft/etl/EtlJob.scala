package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The full ETL pipeline (reference: scripts/run_etl.py →
  * src/etl_for_all_studies/pipeline.py:255-356; SURVEY.md §3.1).
  *
  * Per study: discover files → normalize metadata (X6 accession
  * override) → maintain dims (D1-D3) → melt + whitelist-filter the
  * expression matrix (R1/F1-F4) → key the facts through broadcast dim
  * joins (J3/J4) → anti-join dedup against existing facts (J7, the
  * idempotence contract REQ-005/REQ-007) → append.
  *
  * Studies process sequentially on the driver but every per-study plan
  * is fully distributed; failure isolation per study matches the
  * reference's swallow-log-continue (pipeline.py:351-356).
  */
class EtlJob(spark: SparkSession, config: AppConfig, warehouseDir: String) {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val wh = Warehouse(spark, warehouseDir, config.database)

  case class StudyResult(accession: String, samples: Long, facts: Long,
      error: Option[String] = None, skipped: Boolean = false)

  /** Sequential per-study run. With `resume = true`, studies whose
    * [[StudyState]] row is terminal (facts_loaded) are skipped without
    * touching their data — the D4 resume surface. The default processes
    * everything and relies on the J7 anti-join for idempotence, the
    * reference's own behavior for studies it has already finished
    * (their cleared state means a plain re-run re-scans them too).
    */
  def run(resume: Boolean = false): Seq[StudyResult] = {
    val genes = GeneFilter.load(spark, config.processing.geneFilterFile.toString)
    val dirs = StudyDiscovery.discoverStudyDirs(config.processing.inputDirectory)
    val done = if (resume) StudyState.completed(wh) else Set.empty[String]
    dirs.map { dir =>
      try {
        val files = StudyDiscovery.discoverStudyFiles(dir)
        if (done.contains(files.studyAccession)) {
          log.info(s"Skipping completed study ${files.studyAccession} (resume)")
          StudyResult(files.studyAccession, 0, 0, skipped = true)
        } else processStudy(files, genes)
      } catch {
        case e: Exception =>
          log.error(s"Failed to process study ${dir.getFileName}: ${e.getMessage}")
          StudyResult(dir.getFileName.toString, 0, 0, Some(e.getMessage))
      }
    }
  }

  private case class Prep(acc: String, samples: DataFrame, melted: DataFrame)

  /** Scale path (SURVEY.md §2.10 X1): studies become DATA parallelism.
    * All studies' rows flow through ONE set of batched plans — one
    * upsert per dimension, one whitelist-filtered melt union, one
    * anti-join dedup, one fact append — instead of a per-study driver
    * loop issuing jobs study by study. With hundreds of studies the
    * loop is scheduler-bound; here the union is a single pipeline whose
    * parallelism is the data itself.
    *
    * Failure isolation (X3) happens where the reference's format errors
    * surface: driver-side file discovery and header validation. A study
    * failing there is reported and excluded; the distributed execution
    * then runs over the good studies only. Warehouse contents are
    * value-identical to [[run]] (surrogate keys may be assigned in a
    * different order).
    */
  def runUnioned(resume: Boolean = false): Seq[StudyResult] =
    processUnioned(StudyDiscovery.discoverStudyDirs(config.processing.inputDirectory), resume)

  /** The unioned pipeline over an EXPLICIT study-directory list — the
    * shared engine of [[runUnioned]] (which discovers from the config
    * root) and [[graft.streaming.StreamingEtl]] (which receives newly
    * arrived directories per micro-batch).
    */
  def processUnioned(dirs: Seq[java.nio.file.Path], resume: Boolean = false): Seq[StudyResult] = {
    val done = if (resume) StudyState.completed(wh) else Set.empty[String]

    val attempts: Seq[Either[StudyResult, Prep]] = dirs.map { dir =>
      try {
        val files = StudyDiscovery.discoverStudyFiles(dir)
        val acc = files.studyAccession
        if (done.contains(acc)) {
          log.info(s"Skipping completed study $acc (resume)")
          Left(StudyResult(acc, 0, 0, skipped = true))
        } else {
          val raw = Metadata.load(spark, files.metadataFile.toString, config.fieldMappings)
          if (raw.limit(1).count() == 0)
            throw new StudyProcessingError(s"No valid samples found in metadata ${files.metadataFile}")
          val mismatches = Metadata.mismatchCount(raw, acc)
          if (mismatches > 0)
            log.warn(s"$mismatches samples referenced differing study accession (expected $acc)")
          val samples = Metadata.overrideStudyAccession(raw, acc)
          val expected = samples.select("gsm_accession").distinct()
            .collect().map(_.getString(0)).toSeq.sorted
          val melted = ExpressionMatrix.load(spark, files.expressionFile.toString, expected)
            .withColumn("study_accession", lit(acc))
          Right(Prep(acc, samples, melted))
        }
      } catch {
        case e: Exception =>
          log.error(s"Failed to prepare study ${dir.getFileName}: ${e.getMessage}")
          Left(StudyResult(dir.getFileName.toString, 0, 0, Some(e.getMessage)))
      }
    }
    val failures = attempts.collect { case Left(f) => f }
    val preps = attempts.collect { case Right(p) => p }
    if (preps.isEmpty) return failures

    // On the snapshot backend the whole multi-table load (5 dim writes
    // + state + the fact append) publishes as ONE manifest commit: a
    // crash anywhere in the publish phase leaves readers on the prior
    // snapshot with no trace of this load — the reference's per-study
    // transaction (pipeline.py:271-301) extended to multi-table reader
    // isolation. Other backends publish table-by-table (each op
    // individually crash-safe; X2 idempotence covers re-runs).
    val ok = wh match {
      case sw: SnapshotWarehouse => sw.transact(txn => publishUnioned(txn, preps))
      case other => publishUnioned(other, preps)
    }
    (ok ++ failures).sortBy(_.accession)
  }

  /** The publish phase of [[processUnioned]] — all warehouse reads and
    * writes go through `w`, which is either the backend itself or a
    * [[SnapshotTxn]] (read-your-writes view that defers visibility to
    * one atomic commit).
    */
  private def publishUnioned(w: Warehouse, preps: Seq[Prep]): Seq[StudyResult] = {
    val genes = GeneFilter.load(spark, config.processing.geneFilterFile.toString)
    val allSamples = preps.map(_.samples).reduce(_ unionByName _).cache()

    // ---- dims: one upsert each across every study -----------------------
    w.writeDim("dim_study", Dims.upsertDim(w.read("dim_study"),
      allSamples.select(col("study_accession").as("gse_accession")),
      "study_key", "gse_accession"))
    val studyDim = w.read("dim_study")
      .select(col("gse_accession").as("study_accession"), col("study_key"))
    w.writeDim("dim_platform", Dims.upsertDim(w.read("dim_platform"),
      allSamples.select(col("platform_accession")), "platform_key", "platform_accession"))
    w.writeDim("dim_illness", Dims.upsertDim(w.read("dim_illness"),
      allSamples.select(col("illness_label")), "illness_key", "illness_label"))

    // __ord pins the reference's "first row in file wins" duplicate-GSM
    // resolution (Dims.upsertSampleDim). It comes from Metadata.load:
    // per-file byte offsets, so the order is FILE order regardless of
    // how the scan packs splits — safe for multi-file metadata too.
    // (Cross-study collisions are harmless: __ord only orders rows
    // within one (gsm, study) group.)
    val incoming = Dims.resolveFk(
      Dims.resolveFk(
        allSamples.join(broadcast(studyDim), Seq("study_accession")),
        w.read("dim_platform"), "platform_accession", "platform_accession", "platform_key"),
      w.read("dim_illness"), "illness_label", "illness_label", "illness_key")
      .select("gsm_accession", "study_key", "platform_key", "illness_key", "age", "sex", "__ord")
    w.writeDim("dim_sample", Dims.upsertSampleDim(w.read("dim_sample"), incoming))
    // D4: metadata phase committed for every prepared study
    StudyState.upsert(w, spark, preps.map(_.acc), metadataLoaded = true,
      factsLoaded = false)

    // ---- facts: one melt union, one key join, one dedup, one append -----
    val allMelted = preps.map(_.melted).reduce(_ unionByName _)
    val filtered = GeneFilter.filterGenes(allMelted, genes, "gene_id")
    w.writeDim("dim_gene", Dims.upsertGeneDim(w.read("dim_gene"),
      filtered.select(col("gene_id").as("ensembl_id"))))

    // sample dim joins on (gsm, study) WITHOUT an explicit broadcast:
    // across many studies it is not small; AQE picks the strategy.
    val sampleDim = w.read("dim_sample")
      .select(col("gsm_accession").as("sample_accession"), col("study_key"), col("sample_key"))
    val geneDim = w.read("dim_gene").select(col("ensembl_id").as("gene_id"), col("gene_key"))
    val keyed = filtered
      .join(broadcast(studyDim), Seq("study_accession"))
      .join(sampleDim, Seq("sample_accession", "study_key"))
      .join(broadcast(geneDim), Seq("gene_id"))
      .select("sample_key", "gene_key", "study_key", "expression_value")
      // intra-batch dedup, same contract as processStudy
      .groupBy("sample_key", "gene_key", "study_key")
      .agg(min(col("expression_value")).as("expression_value"))
    val existing = w.read("fact_expression").select("sample_key", "gene_key")
    val fresh = keyed.join(existing, Seq("sample_key", "gene_key"), "left_anti").cache()

    val factsByStudy = fresh.groupBy("study_key").count().collect()
      .map(r => r.getAs[Number]("study_key").longValue() -> r.getAs[Long]("count")).toMap
    w.appendFacts("fact_expression", fresh)
    fresh.unpersist()
    // D4 terminal state: the batch analog of the reference's
    // clear_state-on-success (pipeline.py:299-301) — see StudyState
    StudyState.upsert(w, spark, preps.map(_.acc), metadataLoaded = true,
      factsLoaded = true)

    val samplesByAcc = allSamples.groupBy("study_accession").count().collect()
      .map(r => r.getAs[String]("study_accession") -> r.getAs[Long]("count")).toMap
    allSamples.unpersist()
    val keyByAcc = studyDim.collect()
      .map(r => r.getAs[String]("study_accession") -> r.getAs[Long]("study_key")).toMap
    preps.map { p =>
      StudyResult(p.acc, samplesByAcc.getOrElse(p.acc, 0L),
        keyByAcc.get(p.acc).flatMap(factsByStudy.get).getOrElse(0L))
    }
  }

  /** Per-study load. On the snapshot backend the whole study — dims,
    * state, facts — publishes as ONE manifest commit. That is STRICTER
    * than the reference's per-study transaction: pipeline.py commits
    * the metadata phase mid-study (upsert_state + session.commit,
    * pipeline.py:274-280) before expression processing, so a
    * mid-expression failure there retains the dims and the
    * `metadata_loaded` resume checkpoint; here a failed study leaves
    * NOTHING, including that mid-study resume state — the trade is
    * all-or-nothing isolation for resume granularity (a retried study
    * redoes its metadata phase; X2 idempotence makes that safe). Other
    * backends keep the documented batch-level approximation
    * (metadata-phase dims persist past a later facts failure).
    */
  def processStudy(files: StudyFiles, geneWhitelist: DataFrame): StudyResult =
    wh match {
      case sw: SnapshotWarehouse =>
        sw.transact(txn => processStudyWith(txn, files, geneWhitelist))
      case other => processStudyWith(other, files, geneWhitelist)
    }

  private def processStudyWith(w: Warehouse, files: StudyFiles,
      geneWhitelist: DataFrame): StudyResult = {
    val acc = files.studyAccession

    // --- metadata → dims -------------------------------------------------
    val rawSamples = Metadata.load(spark, files.metadataFile.toString, config.fieldMappings)
    val samples0 = rawSamples.cache()
    if (samples0.limit(1).count() == 0)
      throw new StudyProcessingError(s"No valid samples found in metadata ${files.metadataFile}")
    val mismatches = Metadata.mismatchCount(samples0, acc)
    if (mismatches > 0)
      log.warn(s"$mismatches samples referenced differing study accession (expected $acc)")
    val samples = Metadata.overrideStudyAccession(samples0, acc)

    val dimStudy = Dims.upsertDim(w.read("dim_study"),
      spark.createDataFrame(Seq(Tuple1(acc))).toDF("gse_accession"),
      "study_key", "gse_accession")
    w.writeDim("dim_study", dimStudy)
    val studyKey = w.read("dim_study")
      .where(col("gse_accession") === acc).head.getAs[Long]("study_key")

    val dimPlatform = Dims.upsertDim(w.read("dim_platform"),
      samples.select(col("platform_accession")), "platform_key", "platform_accession")
    w.writeDim("dim_platform", dimPlatform)
    val dimIllness = Dims.upsertDim(w.read("dim_illness"),
      samples.select(col("illness_label")), "illness_key", "illness_label")
    w.writeDim("dim_illness", dimIllness)

    // __ord = per-file byte offset from Metadata.load — true file
    // order under any split layout (see the runUnioned call site)
    val incoming = Dims.resolveFk(
      Dims.resolveFk(
        samples.withColumn("study_key", lit(studyKey)),
        w.read("dim_platform"), "platform_accession", "platform_accession", "platform_key"),
      w.read("dim_illness"), "illness_label", "illness_label", "illness_key")
      .select("gsm_accession", "study_key", "platform_key", "illness_key", "age", "sex", "__ord")
    w.writeDim("dim_sample", Dims.upsertSampleDim(w.read("dim_sample"), incoming))
    // D4: metadata phase committed (pipeline.py:274-280)
    StudyState.upsert(w, spark, Seq(acc), metadataLoaded = true, factsLoaded = false)

    val quality = Metadata.quality(samples0).head
    if (config.logging.logDataQuality) {
      val total = quality.getAs[Long]("total_samples").max(1L)
      log.info(f"Study $acc: ${quality.getAs[Long]("total_samples")} samples, " +
        f"age completion ${100.0 * quality.getAs[Long]("complete_age") / total}%.2f%%, " +
        f"sex completion ${100.0 * quality.getAs[Long]("complete_sex") / total}%.2f%%")
    }

    // --- expression → facts ----------------------------------------------
    val expectedSamples = samples.select("gsm_accession").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val melted = ExpressionMatrix.load(spark, files.expressionFile.toString, expectedSamples)
    val filtered = GeneFilter.filterGenes(melted, geneWhitelist, "gene_id")

    val dimGene = Dims.upsertGeneDim(w.read("dim_gene"),
      filtered.select(col("gene_id").as("ensembl_id")))
    w.writeDim("dim_gene", dimGene)

    val sampleDim = w.read("dim_sample")
      .where(col("study_key") === studyKey)
      .select(col("gsm_accession").as("sample_accession"), col("sample_key"))
    val geneDim = w.read("dim_gene").select(col("ensembl_id").as("gene_id"), col("gene_key"))

    val keyed = filtered
      .join(broadcast(sampleDim), Seq("sample_accession")) // J3
      .join(broadcast(geneDim), Seq("gene_id"))            // J4
      .select(col("sample_key"), col("gene_key"), lit(studyKey).as("study_key"),
        col("expression_value"))
      // intra-batch dedup: the reference's per-row seen-set also drops
      // duplicates WITHIN one file (repeated gene row / repeated GSM
      // column); min() is the deterministic stand-in for its
      // first-in-file-order pick
      .groupBy("sample_key", "gene_key", "study_key")
      .agg(min(col("expression_value")).as("expression_value"))

    val existing = w.read("fact_expression")
      .where(col("study_key") === studyKey)                // F7: partition-pruned
      .select("sample_key", "gene_key")
    val fresh = keyed.join(existing, Seq("sample_key", "gene_key"), "left_anti") // J7
      .cache()

    val factCount = fresh.count()
    w.appendFacts("fact_expression", fresh)
    fresh.unpersist()
    // D4 terminal state: batch analog of clear_state-on-success
    StudyState.upsert(w, spark, Seq(acc), metadataLoaded = true, factsLoaded = true)

    val sampleCount = samples0.count()
    samples0.unpersist()
    if (config.logging.logRecordCounts)
      log.info(s"Study $acc: $factCount expression facts written")
    StudyResult(acc, sampleCount, factCount)
  }
}
