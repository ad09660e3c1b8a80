package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** Behavior tests mirroring the reference's pytest suite (SURVEY.md §5)
  * plus the §7.2 minimum end-to-end slice.
  */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): Path = {
    val d = Files.createTempDirectory("graft-etl")
    d.toFile.deleteOnExit(); d
  }

  private def write(dir: Path, name: String, content: String): Path = {
    val p = dir.resolve(name)
    Files.writeString(p, content); p
  }

  private val metadataTsv =
    """refinebio_accession_code	experiment_accession	refinebio_age	refinebio_sex	refinebio_platform	characteristics_ch2_illness
      |GSM1	GSE9006	16	female	GPL96	Healthy
      |GSM2	GSE9006		female	GPL96	Healthy
      |GSM3	GSE9006	25	male	GPL96	Diabetes
      |	GSE9006	1	male	GPL96	Healthy
      |GSM4	GSE_OTHER	30	male	GPL97	Diabetes
      |""".stripMargin

  // wide matrix: 3 genes x 4 samples (GSM4 column present; extra sample
  // column GSM9 not in metadata -> dropped by F2 only if metadata lacks
  // it; here metadata HAS GSM4 so only GSM9-like cases drop)
  private val expressionTsv =
    """gene	GSM1	GSM2	GSM3	GSM4
      |ENSG1	1.0	2.0	3.0	4.0
      |ENSG2	2.0	4.0	6.0	8.0
      |ENSG3	9.0	5.0	1.0	bad
      |ENSGX	1	1	1	1
      |
      |""".stripMargin

  private val filterTsv = "ensembl_id\nENSG1\nENSG2\nENSG3\n ENSG3 \n\n"

  private def makeStudy(root: Path, gse: String = "GSE9006",
      exprName: Option[String] = None): Path = {
    val d = Files.createDirectories(root.resolve(gse))
    write(d, s"metadata_$gse.tsv", metadataTsv)
    write(d, exprName.getOrElse(s"expression_$gse.tsv"), expressionTsv)
    d
  }

  private def config(root: Path, filter: Path): AppConfig = AppConfig(
    DatabaseConfig("unused"),
    ProcessingConfig(root, filter),
    LoggingConfig(logLevel = "WARN"))

  test("S1: discovery prefers expression_<GSE>.tsv, falls back to <GSE>.tsv") {
    val root = tmpDir()
    val d = makeStudy(root, "GSE1", exprName = Some("GSE1.tsv"))
    val files = StudyDiscovery.discoverStudyFiles(d)
    assert(files.studyAccession == "GSE1")
    assert(files.expressionFile.getFileName.toString == "GSE1.tsv")

    val d2 = makeStudy(root, "GSE2")
    assert(StudyDiscovery.discoverStudyFiles(d2)
      .expressionFile.getFileName.toString == "expression_GSE2.tsv")

    intercept[StudyProcessingError] {
      StudyDiscovery.discoverStudyFiles(Files.createDirectories(root.resolve("empty")))
    }
  }

  test("S3: metadata normalization — variant header, UNKNOWN substitution, blank-GSM skip") {
    val root = tmpDir()
    val p = write(root, "metadata_GSE9006.tsv", metadataTsv)
    val df = Metadata.load(spark, p.toString, FieldMappingConfig()).orderBy("gsm_accession")
    val rows = df.collect()
    assert(rows.length == 4) // blank-GSM row dropped
    val byGsm = rows.map(r => r.getAs[String]("gsm_accession") -> r).toMap
    // digit-stripped variant characteristics_ch2_illness matches
    // candidate characteristics_ch1_Illness (tests/test_metadata_processing.py:12-25)
    assert(byGsm("GSM1").getAs[String]("illness_label") == "Healthy")
    assert(byGsm("GSM3").getAs[String]("illness_label") == "Diabetes")
    // age present/blank -> UNKNOWN substitution (REQ-004)
    assert(byGsm("GSM1").getAs[String]("age") == "16")
    assert(byGsm("GSM2").getAs[String]("age") == "UNKNOWN")
    assert(byGsm("GSM1").getAs[String]("sex") == "female")
    assert(byGsm("GSM1").getAs[String]("platform_accession") == "GPL96")
  }

  test("S3: no matching headers -> all UNKNOWN (tests/test_metadata_processing.py:28-41)") {
    val root = tmpDir()
    val p = write(root, "metadata_X.tsv",
      "refinebio_accession_code\texperiment_accession\nGSM1\tGSEX\n")
    val r = Metadata.load(spark, p.toString, FieldMappingConfig()).head
    Seq("platform_accession", "illness_label", "age", "sex").foreach(c =>
      assert(r.getAs[String](c) == "UNKNOWN", c))
    // required-column enforcement
    val bad = write(root, "metadata_Y.tsv", "foo\tbar\n1\t2\n")
    intercept[MetadataFormatError] {
      Metadata.load(spark, bad.toString, FieldMappingConfig())
    }
  }

  test("S3: header cells are VERBATIM (spark.read.csv + reference parity) — " +
    "padded required header fails, padded optional resolves via tier-3") {
    val root = tmpDir()
    // a whitespace-padded REQUIRED header is NOT trimmed before the
    // required-column check: csv.DictReader keeps fieldnames untrimmed
    // and the reference's check is a verbatim set difference
    // (metadata_processing.py:118-123) — so this must fail, same as it
    // would against the reference
    val padReq = write(root, "metadata_PADREQ.tsv",
      " refinebio_accession_code \texperiment_accession\nGSM1\tGSEX\n")
    intercept[MetadataFormatError] {
      Metadata.load(spark, padReq.toString, FieldMappingConfig())
    }
    // a padded OPTIONAL header still resolves: tier-3 normalization
    // (digit-strip + trim + lowercase, _normalize_header:58 parity)
    // absorbs the padding without mutating the stored header itself
    val padOpt = write(root, "metadata_PADOPT.tsv",
      "refinebio_accession_code\texperiment_accession\t refinebio_age \nGSM1\tGSEX\t42\n")
    val r = Metadata.load(spark, padOpt.toString, FieldMappingConfig()).head
    assert(r.getAs[String]("age") == "42")
  }

  test("S4/R1/F2-F4: melt drops missing sample columns, blank genes, bad numerics") {
    val root = tmpDir()
    val p = write(root, "expression_G.tsv", expressionTsv)
    // GSM5 expected but absent -> warn+drop; GSM1-3 kept
    val out = ExpressionMatrix.load(spark, p.toString, Seq("GSM1", "GSM2", "GSM3", "GSM5"))
    val rows = out.collect()
    // 4 genes x 3 kept samples = 12, minus nothing (bad value was GSM4)
    assert(rows.length == 12)
    assert(out.where($"sample_accession" === "GSM5").count() == 0)
    // bad numeric dropped (F4): full load with GSM4 yields 15 not 16
    val full = ExpressionMatrix.load(spark, p.toString, Seq("GSM1", "GSM2", "GSM3", "GSM4"))
    assert(full.count() == 15)
    intercept[ExpressionFormatError] {
      ExpressionMatrix.load(spark, p.toString, Seq("GSM7"))
    }
    val badHeader = write(root, "expression_B.tsv", "notgene\tGSM1\nENSG1\t1.0\n")
    intercept[ExpressionFormatError] {
      ExpressionMatrix.load(spark, badHeader.toString, Seq("GSM1"))
    }
  }

  test("S2: gene filter loads, trims, dedups, errors on empty") {
    val root = tmpDir()
    val p = write(root, "filter.tsv", filterTsv)
    val genes = GeneFilter.load(spark, p.toString)
    assert(genes.as[String].collect().sorted.toSeq == Seq("ENSG1", "ENSG2", "ENSG3"))
    val noCol = write(root, "f2.tsv", "wrong\nx\n")
    intercept[GeneFilterError] { GeneFilter.load(spark, noCol.toString) }
    val empty = write(root, "f3.tsv", "ensembl_id\n\n  \n")
    intercept[GeneFilterError] { GeneFilter.load(spark, empty.toString) }
  }

  test("D1/D2: dim upsert is idempotent with deterministic keys") {
    val wh = Warehouse(spark, tmpDir().toString)
    val d0 = wh.read("dim_platform")
    val d1 = Dims.upsertDim(d0, Seq("GPL97", "GPL96", "GPL96", "UNKNOWN", " ")
      .toDF("platform_accession"), "platform_key", "platform_accession")
    val got = d1.orderBy("platform_key").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "GPL96"), (2L, "GPL97"))) // sorted naturals, UNKNOWN/blank excluded
    // re-upsert: no new keys
    val d2 = Dims.upsertDim(d1, Seq("GPL96", "GPL98").toDF("platform_accession"),
      "platform_key", "platform_accession")
    val got2 = d2.orderBy("platform_key").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got2 == Seq((1L, "GPL96"), (2L, "GPL97"), (3L, "GPL98")))
  }

  test("D3: sample upsert conditional update (tests/test_repositories.py:28-64)") {
    val wh = Warehouse(spark, tmpDir().toString)
    def inc(rows: Seq[(String, Long, Option[Long], Option[Long], String, String, Long)]) =
      rows.toDF("gsm_accession", "study_key", "platform_key", "illness_key", "age", "sex", "__ord")
    // first batch: UNKNOWN age, platform set
    val s1 = Dims.upsertSampleDim(wh.read("dim_sample"),
      inc(Seq(("GSM1", 1L, Some(1L), None, "UNKNOWN", "female", 0L))))
    val r1 = s1.head
    assert(r1.getAs[Long]("sample_key") == 1L)
    assert(r1.getAs[String]("age") == "UNKNOWN")
    // second batch: fills UNKNOWN age, does NOT overwrite known sex,
    // updates platform to new non-null value
    val s2 = Dims.upsertSampleDim(s1,
      inc(Seq(("GSM1", 1L, Some(2L), Some(5L), "33", "male", 0L))))
    val r2 = s2.head
    assert(r2.getAs[Long]("sample_key") == 1L) // key stable
    assert(r2.getAs[String]("age") == "33")    // UNKNOWN filled
    assert(r2.getAs[String]("sex") == "female") // known NOT overwritten
    assert(r2.getAs[Long]("platform_key") == 2L) // platform updated
    assert(r2.getAs[Long]("illness_key") == 5L)
    // new sample in second study gets next key
    val s3 = Dims.upsertSampleDim(s2,
      inc(Seq(("GSM1", 2L, None, None, "40", "male", 0L))))
    assert(s3.count() == 2)
    assert(s3.where($"study_key" === 2L).head.getAs[Long]("sample_key") == 2L)
  }

  test("E2E slice (SURVEY §7.2): ETL + correlation job, idempotent re-run, stale replace") {
    val root = tmpDir()
    makeStudy(root)
    val filter = write(root, "filter.tsv", filterTsv)
    val whDir = tmpDir().toString
    val cfg = config(root, filter)

    val job = new EtlJob(spark, cfg, whDir)
    val results = job.run()
    assert(results.length == 1 && results.head.error.isEmpty)
    assert(results.head.samples == 4)
    // facts: genes ENSG1-3 (ENSGX filtered), samples GSM1-4;
    // ENSG3/GSM4 cell is "bad" -> dropped => 3*4 - 1 = 11
    assert(results.head.facts == 11)

    val wh = Warehouse(spark, whDir)
    assert(wh.read("dim_study").count() == 1)
    assert(wh.read("dim_gene").count() == 3)
    assert(wh.read("dim_platform").count() == 2)  // GPL96, GPL97
    assert(wh.read("dim_illness").count() == 2)   // Healthy, Diabetes
    assert(wh.read("dim_sample").count() == 4)

    // idempotent re-run: zero new facts (J7 anti-join dedup, REQ-005)
    val rerun = job.run()
    assert(rerun.head.facts == 0)
    assert(wh.read("fact_expression").count() == 11)

    // correlation job
    val corrJob = new CorrelationJob(spark, whDir)
    val summary = corrJob.run()
    assert(summary.studies == Seq("GSE9006"))
    assert(summary.pairs == 3) // C(3,2)
    val corr = wh.read("fact_gene_pair_corr").orderBy("gene_a_key", "gene_b_key").collect()
    assert(corr.length == 3)
    corr.foreach { r =>
      assert(r.getAs[Long]("gene_a_key") < r.getAs[Long]("gene_b_key")) // O4
      assert(r.isNullAt(r.fieldIndex("illness_key")))
      val rho = r.getAs[Double]("rho_spearman")
      assert(rho >= -1.0 && rho <= 1.0)
      val p = r.getAs[Double]("p_value")
      assert(p >= 0.0 && p <= 1.0)
    }
    // ENSG1 vs ENSG2 monotone up over shared samples -> rho 1
    val k = wh.read("dim_gene").orderBy("gene_key").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    val byPair = corr.map(r => (r.getAs[Long]("gene_a_key"), r.getAs[Long]("gene_b_key")) -> r).toMap
    val r12 = byPair((k("ENSG1"), k("ENSG2")))
    assert(math.abs(r12.getAs[Double]("rho_spearman") - 1.0) < 1e-12)
    assert(r12.getAs[Long]("n_samples") == 4)
    // ENSG1 vs ENSG3 shares 3 samples (bad cell dropped), monotone down
    val r13 = byPair((k("ENSG1"), k("ENSG3")))
    assert(r13.getAs[Long]("n_samples") == 3)
    assert(math.abs(r13.getAs[Double]("rho_spearman") + 1.0) < 1e-12)

    // stale-replace (S7): re-run correlation -> still 3 rows, new stamp
    val summary2 = corrJob.run()
    assert(summary2.pairs == 3)
    assert(wh.read("fact_gene_pair_corr").count() == 3)
  }

  test("golden: requirements-doc metadata example normalizes exactly " +
      "(docs/genomic-etl-requirements.md:453-459)") {
    val root = tmpDir()
    val p = write(root, "metadata_GSE9006.tsv",
      """refinebio_accession_code	experiment_accession	refinebio_age	refinebio_sex	refinebio_platform	characteristics_ch1_Age	characteristics_ch1_Sex	characteristics_ch1_Illness
        |GSM228562	GSE9006	16	female	GPL96	16 yrs	F	Healthy
        |GSM228563	GSE9006		female	GPL96	16 yrs	F	Healthy
        |GSM228564	GSE9006	25	male	GPL96	25 yrs	M	UNKNOWN
        |""".stripMargin)
    val out = Metadata.load(spark, p.toString, FieldMappingConfig())
      .orderBy("gsm_accession").collect()
      .map(r => r.getAs[String]("gsm_accession") ->
        ((r.getAs[String]("age"), r.getAs[String]("sex"),
          r.getAs[String]("platform_accession"), r.getAs[String]("illness_label")))).toMap
    assert(out("GSM228562") == (("16", "female", "GPL96", "Healthy")))
    // blank refinebio_age: the exact-match candidate fails for this ROW
    // and resolution falls through to the next candidate header
    // (characteristics_ch1_Age), exactly like _first_non_empty
    // (reference metadata_processing.py:60-102)
    assert(out("GSM228563") == (("16 yrs", "female", "GPL96", "Healthy")))
    // an explicit "UNKNOWN" cell is a VALUE here (F8 maps it to a null
    // FK later, at dim resolution - not at normalization)
    assert(out("GSM228564") == (("25", "male", "GPL96", "UNKNOWN")))
  }

  test("correlation: mixed complete/incomplete studies in one run exercises both Spearman paths") {
    val root = tmpDir()
    makeStudy(root) // GSE9006: bad cell -> incomplete matrix -> exact path
    val d = Files.createDirectories(root.resolve("GSE0002"))
    write(d, "metadata_GSE0002.tsv",
      metadataTsv.replace("GSE9006", "GSE0002").replace("GSE_OTHER", "GSE0002"))
    write(d, "expression_GSE0002.tsv", // complete 3x4 matrix -> dense path
      "gene\tGSM1\tGSM2\tGSM3\tGSM4\n" +
        "ENSG1\t1.0\t2.0\t3.0\t4.0\n" +
        "ENSG2\t2.0\t4.0\t6.0\t8.0\n" +
        "ENSG3\t9.0\t5.0\t1.0\t0.5\n")
    val filter = write(root, "filter.tsv", filterTsv)
    val whDir = tmpDir().toString
    val results = new EtlJob(spark, config(root, filter), whDir).run()
    assert(results.forall(_.error.isEmpty))

    val summary = new CorrelationJob(spark, whDir).run()
    assert(summary.studies.toSet == Set("GSE9006", "GSE0002"))
    assert(summary.pairs == 6) // C(3,2) per study

    val wh = Warehouse(spark, whDir)
    val studyKeys = wh.read("dim_study").collect()
      .map(r => r.getAs[String]("gse_accession") -> r.getAs[Long]("study_key")).toMap
    val geneKeys = wh.read("dim_gene").collect()
      .map(r => r.getAs[String]("ensembl_id") -> r.getAs[Long]("gene_key")).toMap
    val corr = wh.read("fact_gene_pair_corr").collect()
      .groupBy(_.getAs[Number]("study_key").longValue())
    assert(corr(studyKeys("GSE9006")).length == 3)
    assert(corr(studyKeys("GSE0002")).length == 3)

    def pair(study: String, a: String, b: String) =
      corr(studyKeys(study)).find(r =>
        r.getAs[Long]("gene_a_key") == geneKeys(a) &&
          r.getAs[Long]("gene_b_key") == geneKeys(b)).get
    // identical ENSG1/ENSG2 values in both studies -> identical pair
    // stats from the two different paths
    val sparse12 = pair("GSE9006", "ENSG1", "ENSG2")
    val dense12 = pair("GSE0002", "ENSG1", "ENSG2")
    assert(sparse12.getAs[Long]("n_samples") == 4 && dense12.getAs[Long]("n_samples") == 4)
    assert(math.abs(sparse12.getAs[Double]("rho_spearman") - 1.0) < 1e-12)
    assert(math.abs(dense12.getAs[Double]("rho_spearman") - 1.0) < 1e-12)
    assert(sparse12.getAs[Double]("p_value") == dense12.getAs[Double]("p_value"))
    // complete study's ENSG1/ENSG3 strictly decreasing over all 4 samples
    val dense13 = pair("GSE0002", "ENSG1", "ENSG3")
    assert(dense13.getAs[Long]("n_samples") == 4)
    assert(math.abs(dense13.getAs[Double]("rho_spearman") + 1.0) < 1e-12)
    // incomplete study's ENSG1/ENSG3 only shares 3 samples
    assert(pair("GSE9006", "ENSG1", "ENSG3").getAs[Long]("n_samples") == 3)
  }

  test("n=2 edge (tests/test_correlation.py:69-85): pair kept, p stored 1.0, q null") {
    val root = tmpDir()
    val d = Files.createDirectories(root.resolve("GSE0003"))
    write(d, "metadata_GSE0003.tsv",
      """refinebio_accession_code	experiment_accession
        |GSM1	GSE0003
        |GSM2	GSE0003
        |""".stripMargin)
    write(d, "expression_GSE0003.tsv",
      "gene\tGSM1\tGSM2\nENSG1\t1.0\t2.0\nENSG2\t5.0\t3.0\n")
    val filter = write(root, "filter.tsv", filterTsv)
    val whDir = tmpDir().toString
    new EtlJob(spark, config(root, filter), whDir).run()
    new CorrelationJob(spark, whDir).run()

    val corr = Warehouse(spark, whDir).read("fact_gene_pair_corr").collect()
    assert(corr.length == 1) // n = 2 >= MIN_SAMPLES_FOR_CORRELATION
    val r = corr.head
    assert(r.getAs[Long]("n_samples") == 2)
    assert(math.abs(r.getAs[Double]("rho_spearman") + 1.0) < 1e-12) // opposite monotone
    // |rho| >= 1 would give p = 0.0 per C3... but n < 3 takes priority:
    // p is NaN/null in compute, stored as 1.0 (C4 persist policy)
    assert(r.getAs[Double]("p_value") == 1.0)
    assert(r.isNullAt(r.fieldIndex("q_value")))
  }

  test("X1: unioned ETL produces a value-identical warehouse to the per-study loop") {
    val root = tmpDir()
    makeStudy(root) // GSE9006 (incomplete matrix + messy metadata)
    val d = Files.createDirectories(root.resolve("GSE0002"))
    write(d, "metadata_GSE0002.tsv",
      metadataTsv.replace("GSE9006", "GSE0002").replace("GSE_OTHER", "GSE0002"))
    write(d, "expression_GSE0002.tsv",
      "gene\tGSM1\tGSM2\tGSM3\tGSM4\nENSG1\t1.0\t2.0\t3.0\t4.0\nENSG2\t2.0\t4.0\t6.0\t8.0\n")
    // a broken study must fail in BOTH modes without hurting the others
    val bad = Files.createDirectories(root.resolve("GSEBAD"))
    write(bad, "metadata_GSEBAD.tsv", "wrong\tcols\nx\ty\n")
    write(bad, "expression_GSEBAD.tsv", "gene\tGSMX\nENSG1\t1\n")
    val filter = write(root, "filter.tsv", filterTsv)

    val whSeq = tmpDir().toString
    val whUni = tmpDir().toString
    val rSeq = new EtlJob(spark, config(root, filter), whSeq).run()
    val rUni = new EtlJob(spark, config(root, filter), whUni).runUnioned()

    // same per-study outcomes
    def summary(rs: Seq[EtlJob#StudyResult]) =
      rs.map(r => (r.accession, r.samples, r.facts, r.error.isDefined)).sortBy(_._1)
    assert(summary(rSeq) == summary(rUni))
    assert(rSeq.count(_.error.isDefined) == 1)

    // value-identical warehouses (keys may be assigned in another
    // order, so compare natural-value tuples through the dims)
    def factTuples(whDir: String) = {
      val wh = Warehouse(spark, whDir)
      wh.read("fact_expression")
        .join(wh.read("dim_sample")
          .select("sample_key", "gsm_accession", "age", "sex"), "sample_key")
        .join(wh.read("dim_gene"), "gene_key")
        .join(wh.read("dim_study"), "study_key")
        .select("gse_accession", "gsm_accession", "ensembl_id", "expression_value",
          "age", "sex")
        .collect().map(_.toSeq).toSet
    }
    assert(factTuples(whSeq) == factTuples(whUni))
    def dimVals(whDir: String, table: String, natural: String) =
      Warehouse(spark, whDir).read(table).select(natural)
        .collect().map(_.getString(0)).toSet
    assert(dimVals(whSeq, "dim_platform", "platform_accession") ==
      dimVals(whUni, "dim_platform", "platform_accession"))
    assert(dimVals(whSeq, "dim_illness", "illness_label") ==
      dimVals(whUni, "dim_illness", "illness_label"))

    // idempotent re-run in union mode too (J7 holds across the union)
    val rerun = new EtlJob(spark, config(root, filter), whUni).runUnioned()
    assert(rerun.filter(_.error.isEmpty).forall(_.facts == 0))
    assert(factTuples(whUni).size == Warehouse(spark, whUni)
      .read("fact_expression").count().toInt)
  }

  test("intra-batch duplicate gene rows collapse to one fact (reference seen-set parity)") {
    val root = tmpDir()
    val d = Files.createDirectories(root.resolve("GSE0004"))
    write(d, "metadata_GSE0004.tsv",
      "refinebio_accession_code\texperiment_accession\nGSM1\tGSE0004\nGSM2\tGSE0004\n")
    write(d, "expression_GSE0004.tsv",
      "gene\tGSM1\tGSM2\nENSG1\t1.0\t2.0\nENSG1\t9.0\t9.0\nENSG2\t3.0\t4.0\n")
    val filter = write(root, "filter.tsv", filterTsv)
    val whDir = tmpDir().toString
    val res = new EtlJob(spark, config(root, filter), whDir).run()
    assert(res.head.error.isEmpty)
    assert(res.head.facts == 4) // 2 genes x 2 samples, not 6
    assert(Warehouse(spark, whDir).read("fact_expression").count() == 4)
  }

  test("warehouse: empty partitioned append leaves the table readable; empty replace deletes stale partitions") {
    val whDir = tmpDir().toString
    val wh = Warehouse(spark, whDir)
    val schema = Warehouse.schemas("fact_gene_pair_corr")
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

    // a zero-row partitioned append writes no parquet files — the read
    // must still work (declared schema, not inference)
    wh.appendFacts("fact_gene_pair_corr", empty)
    assert(wh.read("fact_gene_pair_corr").count() == 0)
    assert(wh.read("fact_gene_pair_corr").schema("study_key").dataType ==
      org.apache.spark.sql.types.LongType)

    // stale rows of a re-run study must vanish even when the new
    // result is empty (reference delete-then-insert semantics)
    import spark.implicits._
    val rows = Seq((1L, 2L, None: Option[Long], 0.5, 0.1, Some(0.2), 3L, "t", 7L))
      .toDF(schema.fieldNames: _*)
    wh.replaceStudyPartitions("fact_gene_pair_corr", rows, Seq(7L))
    assert(wh.read("fact_gene_pair_corr").count() == 1)
    wh.replaceStudyPartitions("fact_gene_pair_corr", empty, Seq(7L))
    assert(wh.read("fact_gene_pair_corr").count() == 0)
  }

  test("S3: duplicated header cells rename with position suffixes; tier-3 matching still resolves the field") {
    val root = tmpDir()
    // wide GEO/refinebio exports repeat characteristic columns; the
    // CSV-reader path auto-renamed duplicates and the ordinal path
    // must match: refinebio_age appears twice -> refinebio_age2/_age3,
    // the exact candidate misses, and the digit-stripped rule matches
    // both in column order (blank first occurrence falls through)
    val p = write(root, "metadata_DUP.tsv",
      "refinebio_accession_code\texperiment_accession\trefinebio_age\trefinebio_age\n" +
        "GSM1\tGSED\t\t42\n")
    val r = Metadata.load(spark, p.toString, FieldMappingConfig()).head
    assert(r.getAs[String]("age") == "42")
    assert(r.getAs[String]("gsm_accession") == "GSM1")
  }

  test("__ord is FILE order: multi-file metadata where path order ≠ size order resolves duplicate GSMs first-file-wins") {
    val root = tmpDir()
    val metaDir = Files.createDirectories(root.resolve("meta"))
    val header = "refinebio_accession_code\texperiment_accession\trefinebio_age\trefinebio_sex"
    // a_: lexically FIRST but much SMALLER — a size-packed scan (what
    // monotonically_increasing_id ordered by) would put b_'s split
    // first and flip the winner
    write(metaDir, "a_meta.tsv",
      s"$header\nGSMDUP\tGSEX\t11\tfemale\n")
    val bulk = (1 to 2000).map(i => s"GSMF$i\tGSEX\t$i\tmale").mkString("\n")
    write(metaDir, "b_meta.tsv",
      s"$header\nGSMDUP\tGSEX\t99\tmale\n$bulk\n")
    val df = Metadata.load(spark, metaDir.toString, FieldMappingConfig())
    assert(df.count() == 2002)
    // every a_meta row ordinal < every b_meta row ordinal
    val aMax = df.where($"gsm_accession" === "GSMDUP" && $"age" === "11")
      .head.getAs[Long]("__ord")
    val bMin = df.where($"age" === "99").head.getAs[Long]("__ord")
    assert(aMax < bMin)
    // end-to-end: the duplicate-GSM group keeps the FIRST file's values
    val wh = Warehouse(spark, tmpDir().toString)
    val incoming = Dims.resolveFk(
      Dims.resolveFk(df.withColumn("study_key", lit(1L)),
        wh.read("dim_platform"), "platform_accession", "platform_accession", "platform_key"),
      wh.read("dim_illness"), "illness_label", "illness_label", "illness_key")
      .select("gsm_accession", "study_key", "platform_key", "illness_key", "age", "sex", "__ord")
    val dim = Dims.upsertSampleDim(wh.read("dim_sample"), incoming)
    val dup = dim.where($"gsm_accession" === "GSMDUP").head
    assert(dup.getAs[String]("age") == "11")
    assert(dup.getAs[String]("sex") == "female")
  }

  test("CLI: resume is the DEFAULT — a re-run skips the completed study; --no-resume re-scans") {
    val root = tmpDir()
    makeStudy(root)
    val filter = write(root, "filter.tsv", filterTsv)
    val whDir = tmpDir().toString
    val yaml = write(root, "etl.yaml",
      s"""database:
         |  connection_string: unused
         |processing:
         |  input_directory: $root
         |  gene_filter_file: $filter
         |logging:
         |  log_level: WARN
         |""".stripMargin)
    def runCli(args: String*): String = {
      val out = new java.io.ByteArrayOutputStream()
      val code = Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
        Main.run(args.toArray, spark)
      }
      assert(code == 0, s"exit $code; output: $out")
      out.toString("UTF-8")
    }
    val first = runCli("etl", "--config", yaml.toString, "--warehouse", whDir)
    assert(first.contains("facts=11 ok"))
    // default resume (reference pipeline.py:101-105 resumes every run):
    // the completed study is skipped via its terminal state row, no
    // re-scan of its data
    val second = runCli("etl", "--config", yaml.toString, "--warehouse", whDir)
    assert(second.contains("skipped (resume)"), second)
    // --no-resume forces the full pass; J7 still yields zero new facts
    val third = runCli("etl", "--config", yaml.toString, "--warehouse", whDir, "--no-resume")
    assert(third.contains("facts=0 ok"), third)
    assert(Warehouse(spark, whDir).read("fact_expression").count() == 11)
  }

  test("X6: differing experiment accession is overridden to directory accession") {
    val root = tmpDir()
    makeStudy(root)
    val filter = write(root, "filter.tsv", filterTsv)
    val whDir = tmpDir().toString
    new EtlJob(spark, config(root, filter), whDir).run()
    val wh = Warehouse(spark, whDir)
    // GSM4 row claimed GSE_OTHER but must land in GSE9006
    assert(wh.read("dim_study").count() == 1)
    val s = wh.read("dim_sample").where($"gsm_accession" === "GSM4").head
    val studyKey = wh.read("dim_study").head.getAs[Long]("study_key")
    assert(s.getAs[Long]("study_key") == studyKey)
  }
}
