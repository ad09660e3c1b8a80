package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Declarative curation pipelines — the reference's YAML-config
  * discipline (S9, `config.py`) extended to the training-data surface:
  * a corpus-curation run is DATA (an ordered stage list with
  * parameters), not code, so the same reviewed pipeline definition
  * ships across corpora and the run is reproducible from its config.
  *
  * Every stage delegates to an already-verified operator ([[TextStats]],
  * [[Dedup]], [[Sampling]]) — the config layer adds NO new semantics,
  * and a config encoding the p30 funnel's parameters is oracle-checked
  * to produce byte-identical output to the hand-composed
  * [[Curation.curate]] (the x5/x18 two-executions-one-oracle
  * discipline, applied to a whole pipeline).
  *
  * Config errors fail loudly at LOAD time with the stage index and
  * field named — a 100 TB run must die before its first scan, not
  * after three stages.
  */
object CurationPipeline {

  sealed trait Stage
  case class QualityGate(minQuality: Double) extends Stage
  case object NormalizedDedup extends Stage
  case object ExactDedup extends Stage
  case class NearDupDrop(maxHamming: Int) extends Stage
  case class LangFilter(keep: Seq[String]) extends Stage
  case object PiiRedact extends Stage
  case class BoilerplateDrop(minDocs: Int, source: String) extends Stage
  case class HashSample(pct: Int) extends Stage
  case class SplitAssign(splits: Seq[(String, Int)]) extends Stage
  case class TokenBudget(budgetTokens: Long, strata: Seq[String]) extends Stage

  case class Config(stages: Seq[Stage], id: String, text: String)

  class PipelineConfigError(msg: String)
    extends RuntimeException(msg)

  def load(yamlPath: String): Config = {
    val p = java.nio.file.Paths.get(yamlPath)
    if (!java.nio.file.Files.exists(p))
      throw new PipelineConfigError(s"pipeline config not found: $yamlPath")
    loadString(java.nio.file.Files.readString(p))
  }

  def loadString(yamlText: String): Config = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = Option(yaml.load[java.util.Map[String, AnyRef]](yamlText))
      .getOrElse(throw new PipelineConfigError("pipeline config is empty"))
      .asScala
    val pipe = root.get("pipeline") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[AnyRef] }.toMap
      case _ => throw new PipelineConfigError("missing top-level 'pipeline' section")
    }
    val id = pipe.get("id_column").map(_.toString).getOrElse("doc_id")
    val text = pipe.get("text_column").map(_.toString).getOrElse("text")
    val rawStages = pipe.get("stages") match {
      case Some(l: java.util.List[_]) if !l.isEmpty => l.asScala.toSeq
      case _ => throw new PipelineConfigError("'pipeline.stages' must be a non-empty list")
    }
    val stages = rawStages.zipWithIndex.map {
      case (m: java.util.Map[_, _], i) =>
        val sm = m.asScala.map { case (k, v) => k.toString -> v }.toMap
        parseStage(sm.map { case (k, v) => k -> Option(v).map(_.toString).orNull },
          i)
      case (_, i) =>
        throw new PipelineConfigError(s"stage $i is not a mapping")
    }
    stages.dropRight(1).zipWithIndex.foreach {
      case (_: TokenBudget, i) => throw new PipelineConfigError(
        s"stage $i: token_budget reshapes the output and must be the final stage")
      case (_: SplitAssign, i) => throw new PipelineConfigError(
        s"stage $i: split_assign appends a column and must be the final stage")
      case _ => ()
    }
    Config(stages, id, text)
  }

  private def parseStage(m: Map[String, String], i: Int): Stage = {
    def req(k: String): String = m.getOrElse(k,
      throw new PipelineConfigError(s"stage $i (${m.getOrElse("kind", "?")}): missing '$k'"))
    def num[T](k: String, parse: String => T): T =
      try parse(req(k)) catch {
        case _: NumberFormatException =>
          throw new PipelineConfigError(s"stage $i: '$k' is not a number: '${m(k)}'")
      }
    m.getOrElse("kind",
      throw new PipelineConfigError(s"stage $i: missing 'kind'")) match {
      case "quality_gate"     => QualityGate(num("min_quality", _.toDouble))
      case "normalized_dedup" => NormalizedDedup
      case "exact_dedup"      => ExactDedup
      case "near_dup_drop"    => NearDupDrop(num("max_hamming", _.toInt))
      case "lang_filter"      =>
        val keep = req("keep").split(",").map(_.trim).filter(_.nonEmpty).toSeq
        if (keep.isEmpty) throw new PipelineConfigError(s"stage $i: 'keep' is empty")
        LangFilter(keep)
      case "pii_redact"       => PiiRedact
      case "boilerplate_drop" =>
        BoilerplateDrop(num("min_docs", _.toInt), m.getOrElse("source", "source"))
      case "hash_sample"      => HashSample(num("pct", _.toInt))
      case "split_assign"     =>
        // "train:80,val:10,test:10" — Sampling.splitAssign validates
        // positivity and the sum-to-100 contract at run time
        val splits = req("splits").split(",").map(_.trim).filter(_.nonEmpty).toSeq
          .map { part =>
            part.split(":") match {
              case Array(name, pct) => (name.trim, num("splits", _ => pct.trim.toInt))
              case _ => throw new PipelineConfigError(
                s"stage $i: split entry '$part' is not name:pct")
            }
          }
        if (splits.isEmpty) throw new PipelineConfigError(s"stage $i: 'splits' is empty")
        SplitAssign(splits)
      case "token_budget"     =>
        val strata = req("strata").split(",").map(_.trim).filter(_.nonEmpty).toSeq
        if (strata.isEmpty) throw new PipelineConfigError(s"stage $i: 'strata' is empty")
        TokenBudget(num("budget_tokens", _.toLong), strata)
      case other =>
        throw new PipelineConfigError(s"stage $i: unknown stage kind '$other'")
    }
  }

  /** Runs the configured stages in order. Intermediate stages preserve
    * the input column shape; `token_budget` and `split_assign`
    * (final-only, enforced at load) reshape the output.
    *
    * Materialization discipline: a stage's input is eagerly
    * checkpointed ONLY when that stage reads it from BOTH sides of a
    * join (the dedup family) — without the cut, everything upstream
    * (per-row regex pipelines especially) re-evaluates per branch
    * ([[Curation.curate]]'s measured rationale). Single-read stages
    * chain lazily, so a filter→redact→filter run stays one fused
    * pass; checkpointing every stage OUTPUT instead benched the
    * config-driven funnel at 2× its hand-composed twin.
    */
  def run(docs: DataFrame, cfg: Config): DataFrame = {
    val shape = docs.columns.map(col).toIndexedSeq
    cfg.stages.foldLeft(docs) { (df0, stage) =>
      val df = stage match {
        case NormalizedDedup | ExactDedup | NearDupDrop(_) =>
          df0.localCheckpoint(true)
        case _ => df0
      }
      stage match {
        case QualityGate(minQ) =>
          TextStats.withQualityColumns(df, cfg.text)
            .where(round(col("quality_score"), 6) >= minQ)
            .select(shape: _*)
        case NormalizedDedup =>
          val keep = df.groupBy(md5(Dedup.normalizedText(col(cfg.text))).as("__d"))
            .agg(min(col(cfg.id)).as(cfg.id)).select(cfg.id)
          df.join(keep, Seq(cfg.id), "left_semi")
        case ExactDedup =>
          val keep = df.groupBy(md5(col(cfg.text)).as("__d"))
            .agg(min(col(cfg.id)).as(cfg.id)).select(cfg.id)
          df.join(keep, Seq(cfg.id), "left_semi")
        case NearDupDrop(maxH) =>
          val drops = Dedup.simhashPairs(df, maxH, cfg.id, cfg.text)
            .select(col("id_b").as(cfg.id)).distinct()
          df.join(drops, Seq(cfg.id), "left_anti")
        case LangFilter(keep) =>
          TextStats.langIdColumns(df, cfg.text)
            .where(col("lang_pred").isin(keep: _*))
            .select(shape: _*)
        case PiiRedact =>
          TextStats.withPiiColumns(df, cfg.text)
            .withColumn(cfg.text, col("redacted"))
            .select(shape: _*)
        case BoilerplateDrop(minDocs, source) =>
          TextStats.dropBoilerplateLines(df, minDocs, cfg.id, source, cfg.text)
            .withColumn(cfg.text, col("text_clean"))
            .select(shape: _*)
        case HashSample(pct) =>
          Sampling.bernoulliByHash(df, col(cfg.id), pct)
        case SplitAssign(splits) =>
          Sampling.splitAssign(df, col(cfg.id), splits)
        case TokenBudget(budget, strata) =>
          Sampling.tokenBudgetSample(df, strata, budget, cfg.id, cfg.text)
            .select((col(cfg.id) +: strata.map(col)
              :+ col("n_tokens") :+ col("cum_tokens")): _*)
      }
    }
  }
}
