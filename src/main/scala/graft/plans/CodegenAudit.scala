package graft.plans

import org.apache.spark.sql.SparkSession

/** Codegen-fallback TRIPWIRE support (round 13).
  *
  * The p36 incident — an interpreted lambda projection silently costing
  * 2.3 s where the codegen'd form costs 0.15 s — is a CLASS of
  * regression, not an instance: any expression change can push an
  * operator out of whole-stage codegen and nothing fails, the bench
  * just quietly slows. The tripwire walks the FINAL executed plan
  * (post-AQE: the query is run first) of the most expensive benched
  * queries and counts `Project`/`Filter` nodes that are NOT inside a
  * whole-stage-codegen region — in the plan text, codegen'd operators
  * print as `*(id) Project ...`, interpreted ones as bare `Project
  * ...`. CodegenTripwireSpec ratchets those counts: some bare nodes
  * are legitimate today (object-typed aggregation boundaries, the
  * documented UDF tier), so the assertion is `<= the checked-in
  * count`, which makes any FUTURE fallback a loud suite failure
  * instead of a bench eyeball.
  */
object CodegenAudit {

  /** The audited set: the 20 most expensive BATCH queries by
    * BENCHDETAIL_r12 min-of-12 (streaming queries are excluded — their
    * returned frame is a memory-sink scan, not the executed pipeline,
    * and their wall is micro-batch overhead, not expression codegen).
    */
  val GatedQueries: Seq[String] = Seq(
    "p66_ivfpq_residual", "p64_ivfpq_topk", "p86_dedup_eval",
    "p83_retrieval_eval", "p82_vocab_rebalance", "p88_fleiss_kappa",
    "p77_agreement_kappa", "p81_split_by_component", "p85_mcnemar",
    "c2_spearman_pairs", "p59_hard_negatives", "p13_ivf_topk",
    "a18_median_ci", "p75_auc_bootstrap", "p41_declarative_funnel",
    "p42_ivf_incremental", "p30_curation_funnel", "p52_tokenizer_compare",
    "p25_lsh_topk_banded", "p50_bpe_encode")

  case class BareCounts(bareProjects: Int, bareFilters: Int)

  /** Run `name` to completion (so AQE finalizes every stage), then
    * count bare Project/Filter lines in the executed-plan text.
    */
  def bareCounts(spark: SparkSession, sfDir: String, name: String): BareCounts = {
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // execute THIS QueryExecution (a write would build its own and
    // leave this one isFinalPlan=false with no codegen markers at all):
    // running the internal RDD finalizes every adaptive stage in place
    df.queryExecution.toRdd.count()
    fromPlanText(df.queryExecution.executedPlan.toString)
  }

  /** Parse a physical-plan tree string: a whole-stage-codegen'd
    * operator prints as `*(id) Project [...]`, an interpreted one as
    * `Project [...]`. Tree-drawing prefixes (`+-`, `:-`, `:  `) are
    * stripped per line before matching.
    */
  private[graft] def fromPlanText(plan: String): BareCounts = {
    // AQE prints the CURRENT (final) plan followed by "== Initial
    // Plan ==", whose operators carry no codegen markers by
    // construction — count only the executed section
    val executed = plan.indexOf("== Initial Plan ==") match {
      case -1 => plan
      case i  => plan.substring(0, i)
    }
    val node = """^(?:[\s:+|-]*)(\*\(\d+\)\s+)?(Project|Filter)[\s\[].*""".r
    var p = 0; var f = 0
    executed.linesIterator.foreach {
      case node(star, op) if star == null =>
        if (op == "Project") p += 1 else f += 1
      case _ => ()
    }
    BareCounts(p, f)
  }
}
