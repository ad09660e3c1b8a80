package graft.etl

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet star-schema warehouse (SURVEY.md §2.1 S6-S8).
  *
  * Facts are partitioned by `study_key`, which gives:
  *  - partition pruning for per-study predicates (F7);
  *  - per-study replace via dynamic partition overwrite (S7 — the
  *    reference's delete-then-insert, repositories.py:303-309, without
  *    a delete);
  *  - per-study write atomicity through the task-commit protocol (the
  *    contract of X2/X3, mechanism replaced per SURVEY.md §7.5).
  */
class Warehouse(spark: SparkSession, baseDir: String) {
  import Warehouse._

  def path(table: String): String = s"$baseDir/$table"

  private def exists(table: String): Boolean =
    new java.io.File(path(table)).exists()

  def read(table: String): DataFrame =
    if (exists(table)) spark.read.parquet(path(table))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemas(table))

  /** Dims are tiny: rewritten whole per batch via tmp + atomic rename
    * (can't overwrite a path that is also the read source of the plan).
    */
  def writeDim(table: String, df: DataFrame): Unit = {
    val tmp = path(table) + "__tmp"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val dir = new java.io.File(path(table))
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        if (!f.delete())
          throw new java.io.IOException(s"Failed to delete $f while replacing dim $table")
      }
      rm(dir)
    }
    // a silently-failed rename would leave the dim missing/stale and
    // the next read would reassign surrogate keys from the wrong max
    if (!new java.io.File(tmp).renameTo(dir))
      throw new java.io.IOException(s"Failed to move $tmp into place for dim $table")
  }

  def appendFacts(table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).partitionBy("study_key").parquet(path(table))

  /** S7: replace exactly the study partitions present in `df`. */
  def overwriteStudyPartitions(table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("study_key")
      .parquet(path(table))
}

object Warehouse {
  private def f(n: String, t: DataType, nullable: Boolean = false) =
    StructField(n, t, nullable)

  /** Authoritative schemas (reference models.py:15-131, SURVEY.md §1.4). */
  val schemas: Map[String, StructType] = Map(
    "dim_gene" -> StructType(Seq(f("gene_key", LongType), f("ensembl_id", StringType))),
    "dim_study" -> StructType(Seq(f("study_key", LongType), f("gse_accession", StringType))),
    "dim_illness" -> StructType(Seq(f("illness_key", LongType), f("illness_label", StringType))),
    "dim_platform" -> StructType(Seq(f("platform_key", LongType), f("platform_accession", StringType))),
    "dim_sample" -> StructType(Seq(
      f("sample_key", LongType), f("gsm_accession", StringType),
      f("study_key", LongType), f("platform_key", LongType, nullable = true),
      f("illness_key", LongType, nullable = true), f("age", StringType),
      f("sex", StringType))),
    "fact_expression" -> StructType(Seq(
      f("sample_key", LongType), f("gene_key", LongType),
      f("study_key", LongType), f("expression_value", DoubleType))),
    "fact_gene_pair_corr" -> StructType(Seq(
      f("gene_a_key", LongType), f("gene_b_key", LongType),
      f("illness_key", LongType, nullable = true), f("rho_spearman", DoubleType),
      f("p_value", DoubleType), f("q_value", DoubleType, nullable = true),
      f("n_samples", LongType), f("computed_at", StringType),
      f("study_key", LongType))))
}
