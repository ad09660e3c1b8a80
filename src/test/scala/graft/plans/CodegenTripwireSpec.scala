package graft.plans

import graft.SparkSpec

/** Codegen-fallback tripwire (round 13): the p36 incident class — an
  * expression change silently pushing an operator out of whole-stage
  * codegen (2.3 s vs 0.15 s there) — must fail the SUITE, not wait
  * for a bench eyeball. For the 20 most expensive batch queries this
  * executes the real query at sf0.001 and counts Project/Filter nodes
  * outside codegen regions in the FINAL adaptive plan
  * ([[CodegenAudit]]); the checked-in number is a RATCHET: today's
  * bare nodes are audited legitimate (object-typed aggregation
  * boundaries — TypedImperativeAggregate percentile/collect buffers,
  * the documented UDF tier around BPE, post-shuffle stitch projections
  * AQE leaves outside a stage), and any INCREASE means something fell
  * out of codegen.
  *
  * Reseed protocol (ProbeCodegen prints the table): lower freely;
  * raise only after reading the plan and documenting WHY the new bare
  * node is legitimate — never to absorb an unexplained fallback.
  */
class CodegenTripwireSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Max allowed bare (non-codegen) Project+Filter nodes, measured
    * round 13 (Test/runMain graft.tools.ProbeCodegen).
    */
  private val ratchet: Map[String, Int] = Map(
    "p66_ivfpq_residual" -> 5,
    "p64_ivfpq_topk" -> 3,
    "p86_dedup_eval" -> 0,
    "p83_retrieval_eval" -> 4,
    "p82_vocab_rebalance" -> 0,
    "p88_fleiss_kappa" -> 3,
    "p77_agreement_kappa" -> 1,
    "p85_mcnemar" -> 1,
    "p81_split_by_component" -> 0,
    "c2_spearman_pairs" -> 0,
    "p59_hard_negatives" -> 2,
    "p13_ivf_topk" -> 2,
    "a18_median_ci" -> 2,
    "p75_auc_bootstrap" -> 0,
    "p41_declarative_funnel" -> 0,
    "p42_ivf_incremental" -> 4,
    "p30_curation_funnel" -> 0,
    "p52_tokenizer_compare" -> 0,
    "p25_lsh_topk_banded" -> 0,
    "p50_bpe_encode" -> 1)

  test("audited query set matches the ratchet table") {
    assert(CodegenAudit.GatedQueries.toSet == ratchet.keySet,
      "GatedQueries and the ratchet table drifted apart — reseed via ProbeCodegen")
  }

  test("top-20 batch queries: no NEW interpreted Project/Filter outside codegen regions") {
    val over = CodegenAudit.GatedQueries.flatMap { name =>
      val c = CodegenAudit.bareCounts(spark, sfDir, name)
      val bare = c.bareProjects + c.bareFilters
      if (bare > ratchet(name)) Some((name, bare, ratchet(name))) else None
    }
    assert(over.isEmpty,
      over.map { case (n, got, max) =>
        s"$n: $got bare Project/Filter nodes (ratchet $max) — an operator fell " +
          "out of whole-stage codegen; read the plan before touching the ratchet"
      }.mkString("\n"))
  }
}
