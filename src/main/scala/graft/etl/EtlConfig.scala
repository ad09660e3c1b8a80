package graft.etl

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Configuration model + YAML loader (reference: src/etl_for_all_studies/
  * config.py:112-192 — sections database/processing/logging/
  * field_mappings with the same defaults and path validation).
  * snakeyaml ships with Spark's jars, so no extra dependency.
  */
case class DatabaseConfig(
    connectionString: String,
    batchSize: Int = 1000,
    connectionTimeout: Int = 30,
    maxRetries: Int = 5,
    retryBackoffSeconds: Int = 5)

case class ProcessingConfig(
    inputDirectory: Path,
    geneFilterFile: Path,
    maxConcurrentStudies: Int = 6,
    stateDirectory: Option[Path] = None)

case class LoggingConfig(
    logLevel: String = "INFO",
    logDirectory: Path = Paths.get("./logs"),
    logProcessingTime: Boolean = true,
    logRecordCounts: Boolean = true,
    logDataQuality: Boolean = true)

/** Candidate header lists for dynamic metadata column resolution
  * (config.py:44-67). Order matters — first matching candidate wins.
  */
case class FieldMappingConfig(
    ageFields: Seq[String] = Seq(
      "refinebio_age", "characteristics_ch1_Age", "characteristics_ch1_age",
      "MetaSRA_age"),
    sexFields: Seq[String] = Seq(
      "refinebio_sex", "characteristics_ch1_Sex", "characteristics_ch1_Gender",
      "sex"),
    illnessFields: Seq[String] = Seq(
      "characteristics_ch1_Illness", "refinebio_disease", "illness"),
    platformFields: Seq[String] = Seq("refinebio_platform", "platform_id"))

case class AppConfig(
    database: DatabaseConfig,
    processing: ProcessingConfig,
    logging: LoggingConfig = LoggingConfig(),
    fieldMappings: FieldMappingConfig = FieldMappingConfig())

class ConfigurationError(msg: String) extends RuntimeException(msg)

object EtlConfig {

  def load(yamlPath: String): AppConfig = {
    if (!Files.exists(Paths.get(yamlPath)))
      throw new ConfigurationError(s"Configuration file not found: $yamlPath")
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = Option(yaml.load[java.util.Map[String, AnyRef]](
      Files.readString(Paths.get(yamlPath))))
      .getOrElse(throw new ConfigurationError(s"Configuration file $yamlPath is empty"))
      .asScala

    def section(name: String): Map[String, AnyRef] =
      root.get(name) match {
        case Some(m: java.util.Map[_, _]) =>
          m.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[AnyRef] }.toMap
        case _ => Map.empty
      }
    def str(m: Map[String, AnyRef], k: String): Option[String] =
      m.get(k).map(_.toString)
    def int(m: Map[String, AnyRef], k: String, default: Int): Int =
      str(m, k).map(v => try v.toInt catch {
        case _: NumberFormatException =>
          throw new ConfigurationError(s"$k must be an integer, got '$v' ($yamlPath)")
      }).getOrElse(default)
    def bool(m: Map[String, AnyRef], k: String, default: Boolean): Boolean =
      str(m, k).map(v => try v.toBoolean catch {
        case _: IllegalArgumentException =>
          throw new ConfigurationError(s"$k must be true/false, got '$v' ($yamlPath)")
      }).getOrElse(default)
    def strs(m: Map[String, AnyRef], k: String): Option[Seq[String]] =
      m.get(k).collect { case l: java.util.List[_] => l.asScala.map(_.toString).toSeq }

    val db = section("database")
    val proc = section("processing")
    val log = section("logging")
    val fm = section("field_mappings")

    val database = DatabaseConfig(
      connectionString = str(db, "connection_string").getOrElse(
        throw new ConfigurationError("database.connection_string is required")),
      batchSize = int(db, "batch_size", 1000),
      connectionTimeout = int(db, "connection_timeout", 30),
      maxRetries = int(db, "max_retries", 5),
      retryBackoffSeconds = int(db, "retry_backoff_seconds", 5))

    val processing = ProcessingConfig(
      inputDirectory = Paths.get(str(proc, "input_directory").getOrElse(
        throw new ConfigurationError("processing.input_directory is required"))),
      geneFilterFile = Paths.get(str(proc, "gene_filter_file").getOrElse(
        throw new ConfigurationError("processing.gene_filter_file is required"))),
      maxConcurrentStudies = int(proc, "max_concurrent_studies", 6),
      stateDirectory = str(proc, "state_directory").map(Paths.get(_)))

    val logging = LoggingConfig(
      logLevel = str(log, "log_level").getOrElse("INFO"),
      logDirectory = Paths.get(str(log, "log_directory").getOrElse("./logs")),
      logProcessingTime = bool(log, "log_processing_time", default = true),
      logRecordCounts = bool(log, "log_record_counts", default = true),
      logDataQuality = bool(log, "log_data_quality", default = true))

    val defaults = FieldMappingConfig()
    val mappings = FieldMappingConfig(
      ageFields = strs(fm, "age_fields").getOrElse(defaults.ageFields),
      sexFields = strs(fm, "sex_fields").getOrElse(defaults.sexFields),
      illnessFields = strs(fm, "illness_fields").getOrElse(defaults.illnessFields),
      platformFields = strs(fm, "platform_fields").getOrElse(defaults.platformFields))

    AppConfig(database, processing, logging, mappings)
  }
}
