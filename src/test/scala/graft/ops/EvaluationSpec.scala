package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exactness anatomy of the evaluation family (p72/p73): the rank-sum
  * AUC identity on known orderings, tie-averaging, and the integer
  * calibration lattice.
  */
class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  test("p72: AUC is 1 for a perfect separator, 0 for an inverted one, exactly 1/2 under total ties") {
    val perfect = (1L to 100L).map(i =>
      (i, "g", if (i <= 50) 0.1 + i * 1e-3 else 0.5 + i * 1e-3, if (i <= 50) 0L else 1L))
      .toDF("doc_id", "g", "p_hat", "label")
    val a1 = Evaluation.aucByGroup(perfect, "g").select("auc").as[Double].head()
    assert(a1 == 1.0, s"perfect separator must score AUC 1.0, got $a1")
    val inverted = perfect.withColumn("label", lit(1L) - col("label"))
    val a0 = Evaluation.aucByGroup(inverted, "g").select("auc").as[Double].head()
    assert(a0 == 0.0, s"inverted separator must score AUC 0.0, got $a0")
    // every score identical: tie-averaged ranks make AUC exactly 1/2
    // (the ties-count-half convention) — not approximately
    val ties = (1L to 100L).map(i => (i, "g", 0.5, i % 2))
      .toDF("doc_id", "g", "p_hat", "label")
    val ah = Evaluation.aucByGroup(ties, "g").select("auc").as[Double].head()
    assert(ah == 0.5, s"all-tied scores must give exactly 0.5, got $ah")
  }

  test("p85: mcnemar hand case — discordant cells only, both statistics, no-discordance gates NULL") {
    // 10 docs, all label 1: A right on 1..8, B right on 1..4 and 9..10
    // -> n_a_only = {5,6,7,8} = 4, n_b_only = {9,10} = 2
    val a = (1L to 10L).map(i => (i, "g", i <= 8, 1L))
      .toDF("doc_id", "g", "keep", "label")
    val b = (1L to 10L).map(i => (i, i <= 4 || i >= 9, 1L))
      .toDF("doc_id", "keep", "label")
    val r = Evaluation.mcnemar(a, b, "g").collect().head
    assert(r.getAs[Long]("n_docs") == 10 && r.getAs[Long]("n_right_a") == 8 &&
      r.getAs[Long]("n_right_b") == 6)
    assert(r.getAs[Long]("n_a_only") == 4 && r.getAs[Long]("n_b_only") == 2)
    // (4-2)^2 * 1e6 DIV 6 = 666666; cc: (|2|-1)^2 * 1e6 DIV 6 = 166666
    assert(r.getAs[Long]("chi2_micro") == 666666L)
    assert(r.getAs[Long]("chi2cc_micro") == 166666L)
    // swapping the models swaps the cells but not the statistic
    val sw = Evaluation.mcnemar(
      b.withColumn("g", lit("g")), a.drop("g"), "g").collect().head
    assert(sw.getAs[Long]("n_a_only") == 2 && sw.getAs[Long]("n_b_only") == 4)
    assert(sw.getAs[Long]("chi2_micro") == 666666L)
    // identical raters: zero discordance -> the test is undefined, NULL
    val same = Evaluation.mcnemar(a, a.select("doc_id", "keep", "label"), "g")
      .collect().head
    assert(same.isNullAt(same.fieldIndex("chi2_micro")) &&
      same.isNullAt(same.fieldIndex("chi2cc_micro")),
      "no discordant pairs must gate to NULL, not 0")
  }

  test("p86: pairEval hand case — hits, misses, false alarms; empty sides gate their ratio NULL") {
    val sys = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val tru = Seq((1L, 2L), (4L, 5L), (6L, 7L), (8L, 9L)).toDF("id_a", "id_b")
    val r = Evaluation.pairEval(sys, tru).collect().head
    assert(r.getAs[Long]("n_system") == 3 && r.getAs[Long]("n_truth") == 4 &&
      r.getAs[Long]("n_hit") == 2)
    // 2/3 = 6666 bps, 2/4 = 5000 bps, F1 = 4*1e4/7 = 5714 bps
    assert(r.getAs[Long]("precision_bps") == 6666L)
    assert(r.getAs[Long]("recall_bps") == 5000L)
    assert(r.getAs[Long]("f1_bps") == 5714L)
    // an empty system side: precision undefined (NULL), recall 0
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val e = Evaluation.pairEval(none, tru).collect().head
    assert(e.getAs[Long]("n_system") == 0 && e.getAs[Long]("n_hit") == 0)
    assert(e.isNullAt(e.fieldIndex("precision_bps")), "0-pair precision must be NULL")
    assert(e.getAs[Long]("recall_bps") == 0L)
  }

  test("p88: fleiss kappa hand case — mixed votes, perfect mixed agreement = 1, unanimous-constant gates NULL") {
    // m=3 raters, 10 items: 4 all-keep, 4 all-drop, 2 with one keep
    // A = 4*6 + 4*6 + 2*2 = 52, K = 14; P̄ = 52/60, P̄e = 452/900
    // kappa = 19680/26880 = 0.732143 (6 dp)
    def rater(keeps: Set[Long], withG: Boolean) = {
      val df = (1L to 10L).map(i => (i, keeps.contains(i)))
        .toDF("doc_id", "keep")
      if (withG) df.withColumn("g", lit("g")) else df
    }
    // items 1..4 all keep; items 5,6 get exactly one keep vote (r1)
    val r1 = rater((1L to 6L).toSet, withG = true)
    val r2 = rater((1L to 4L).toSet, withG = false)
    val r3 = rater((1L to 4L).toSet, withG = false)
    val out = Evaluation.fleissKappa(Seq(r1, r2, r3), "g").collect().head
    assert(out.getAs[Long]("n_docs") == 10 && out.getAs[Long]("n_keep_votes") == 14)
    assert(out.getAs[Long]("pbar_micro") == 866666L)
    assert(out.getAs[Long]("pe_micro") == 502222L)
    assert(out.getAs[Double]("kappa") == 0.732143)
    // perfect agreement on a MIXED panel: kappa exactly 1
    val p1 = rater((1L to 5L).toSet, withG = true)
    val p2 = rater((1L to 5L).toSet, withG = false)
    val perfect = Evaluation.fleissKappa(Seq(p1, p2, p2), "g").collect().head
    assert(perfect.getAs[Double]("kappa") == 1.0)
    // unanimous-constant panel: P̄e = 1, undefined -> NULL
    val u1 = rater((1L to 10L).toSet, withG = true)
    val u2 = rater((1L to 10L).toSet, withG = false)
    val und = Evaluation.fleissKappa(Seq(u1, u2, u2), "g").collect().head
    assert(und.isNullAt(und.fieldIndex("kappa")),
      "unanimous-constant raters must gate to NULL")
  }

  test("p89: subgroup audit — per-group confusion, parity gaps vs pooled, empty-denominator gates") {
    // group A: 8 of 10 positives kept (tpr 8000), 1 of 5 negatives
    // kept (fpr 2000); group B: 3 of 10 kept (tpr 3000), 4 of 5 kept
    // (fpr 8000). Pooled: tpr 5500, fpr 5000.
    def rows(g: String, tp: Int, fn: Int, fp: Int, tn: Int) =
      Seq.fill(tp)((g, true, 1L)) ++ Seq.fill(fn)((g, false, 1L)) ++
        Seq.fill(fp)((g, true, 0L)) ++ Seq.fill(tn)((g, false, 0L))
    val scored = (rows("A", 8, 2, 1, 4) ++ rows("B", 3, 7, 4, 1))
      .toDF("g", "keep", "label")
    val out = Evaluation.subgroupAudit(scored, "g").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(out("A").getAs[Long]("tpr_bps") == 8000L &&
      out("A").getAs[Long]("fpr_bps") == 2000L)
    assert(out("A").getAs[Long]("tpr_gap_bps") == 2500L &&
      out("A").getAs[Long]("fpr_gap_bps") == -3000L)
    assert(out("B").getAs[Long]("tpr_gap_bps") == -2500L &&
      out("B").getAs[Long]("fpr_gap_bps") == 3000L)
    assert(out("A").getAs[Long]("acc_bps") == 8000L) // (8+4)/15
    // a group with no positives: tpr and its gap are NULL, never 0
    val noPos = (rows("A", 5, 5, 2, 3) ++
      Seq.fill(4)(("C", true, 0L)) ++ Seq.fill(6)(("C", false, 0L)))
      .toDF("g", "keep", "label")
    val c = Evaluation.subgroupAudit(noPos, "g").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(c("C").isNullAt(c("C").fieldIndex("tpr_bps")) &&
      c("C").isNullAt(c("C").fieldIndex("tpr_gap_bps")),
      "an all-negative group's TPR must gate to NULL")
    assert(c("C").getAs[Long]("fpr_bps") == 4000L)
  }

  test("x33: the monotone confusion drain recovers the final state; parity tail is SHARED with batch p89") {
    // simulated UPDATE-mode sink: each (window, group) emits two
    // updates with strictly growing n_docs — the drain must keep the
    // later one per key, exactly
    val w1 = new java.sql.Timestamp(0L); val w2 = new java.sql.Timestamp(256000L)
    val updates = Seq(
      (w1, "A", 3L, 2L, 1L, 0L, 0L), (w1, "A", 5L, 3L, 1L, 1L, 0L),
      (w1, "B", 2L, 0L, 1L, 1L, 0L), (w1, "B", 4L, 1L, 1L, 1L, 1L),
      (w2, "A", 6L, 2L, 2L, 1L, 1L))
      .toDF("w", "g", "n_docs", "tp", "fp", "tn", "fn")
    val drained = Evaluation.drainLatestConfusion(updates, "g").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("w"), r.getAs[String]("g")) -> r).toMap
    assert(drained.size == 3)
    assert(drained((w1, "A")).getAs[Long]("n_docs") == 5 &&
      drained((w1, "A")).getAs[Long]("tp") == 3)
    assert(drained((w1, "B")).getAs[Long]("fn") == 1)
    // the parity tail over the drained frame equals running
    // subgroupAudit per window on the equivalent scored rows — one
    // definition, two executions
    def rows(g: String, tp: Int, fp: Int, tn: Int, fn: Int) =
      Seq.fill(tp)((g, true, 1L)) ++ Seq.fill(fp)((g, true, 0L)) ++
        Seq.fill(tn)((g, false, 0L)) ++ Seq.fill(fn)((g, false, 1L))
    val w1scored = (rows("A", 3, 1, 1, 0) ++ rows("B", 1, 1, 1, 1))
      .toDF("g", "keep", "label")
    val batch = Evaluation.subgroupAudit(w1scored, "g").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    val streamTail = Evaluation.parityFromCounts(
      Evaluation.drainLatestConfusion(updates, "g")
        .where(col("w") === w1).drop("w"),
      Seq("g"), Seq.empty).collect().map(r => r.getAs[String]("g") -> r).toMap
    for (g <- Seq("A", "B"); c <- Seq("tpr_bps", "fpr_bps", "acc_bps",
        "tpr_gap_bps", "fpr_gap_bps")) {
      val (b, s) = (batch(g), streamTail(g))
      val (bi, si) = (b.fieldIndex(c), s.fieldIndex(c))
      assert(b.isNullAt(bi) == s.isNullAt(si) &&
        (b.isNullAt(bi) || b.getLong(bi) == s.getLong(si)),
        s"batch/stream parity drift on $g.$c")
    }
  }

  test("p72: hand-computed mixed case with ties; single-class groups yield null") {
    // scores: pos {0.9, 0.7, 0.5}, neg {0.7, 0.3} — pairs: (0.9 beats
    // both) + (0.7 vs 0.3 win, vs 0.7 half) + (0.5 vs 0.3 win, vs 0.7
    // loss) = 4.5 / 6 = 0.75
    val df = Seq(
      (1L, "g", 0.9, 1L), (2L, "g", 0.7, 1L), (3L, "g", 0.5, 1L),
      (4L, "g", 0.7, 0L), (5L, "g", 0.3, 0L),
      (6L, "solo", 0.4, 1L), (7L, "solo", 0.6, 1L))
      .toDF("doc_id", "g", "p_hat", "label")
    val rows = Evaluation.aucByGroup(df, "g").collect()
      .map(r => r.getAs[String]("g") -> Option(r.getAs[java.lang.Double]("auc"))).toMap
    assert(rows("g").contains(0.75), s"hand case must be 0.75: ${rows("g")}")
    assert(rows("solo").isEmpty, "a single-class group has no AUC")
  }

  test("p75: bootstrap point AUC equals the rank-sum AUC on the micro grid") {
    // the w=1 resample's weighted Mann-Whitney must reproduce p72's
    // tie-averaged AUC exactly (same identity, integer form)
    val df = Seq(
      (1L, "g", 0.9, 1L), (2L, "g", 0.7, 1L), (3L, "g", 0.5, 1L),
      (4L, "g", 0.7, 0L), (5L, "g", 0.3, 0L))
      .toDF("doc_id", "g", "p_hat", "label")
    val r = Evaluation.aucBootstrapCi(df, "g").collect().head
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("auc_micro") == 750000L,
      s"hand case is 0.75: ${r.getAs[Long]("auc_micro")}")
  }

  test("p75: CI brackets the point, tightens with n, deterministic; degenerate groups keep null bounds") {
    // larger cohorts must yield narrower AUC intervals around the same
    // generating process (scores carry signal: pos ~ higher)
    def cohort(g: String, n: Int, off: Long): Seq[(Long, String, Double, Long)] =
      (1 to n).map { i =>
        val y = i % 2L
        val s = (if (y == 1L) 0.55 else 0.45) + ((i * 7 + off) % 41 - 20) * 0.01
        (off + i, g, s, y)
      }
    val df = (cohort("small", 60, 1000L) ++ cohort("large", 1500, 2000L))
      .toDF("doc_id", "g", "p_hat", "label")
    val out = Evaluation.aucBootstrapCi(df, "g").collect()
      .map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("auc_micro"), r.getAs[Long]("ci_lo_micro"),
          r.getAs[Long]("ci_hi_micro"))).toMap
    val (sp, sl, sh) = out("small")
    val (lp, ll, lh) = out("large")
    assert(sl <= sp && sp <= sh, s"small interval must bracket: ($sl, $sp, $sh)")
    assert(ll <= lp && lp <= lh, s"large interval must bracket: ($ll, $lp, $lh)")
    assert(lh - ll < sh - sl,
      s"25x the data must tighten the CI: large ${lh - ll} vs small ${sh - sl}")
    val again = Evaluation.aucBootstrapCi(df, "g").collect()
      .map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("auc_micro"), r.getAs[Long]("ci_lo_micro"),
          r.getAs[Long]("ci_hi_micro"))).toMap
    assert(again == out, "bootstrap CI must be a deterministic corpus function")
    // single-positive group: most resamples drop the positive class ->
    // the rank-63 bound cannot populate, but the point row survives
    val deg = ((1L to 40L).map(i => (i, "d", 0.4, 0L)) :+ ((99L, "d", 0.9, 1L)))
      .toDF("doc_id", "g", "p_hat", "label")
    val dr = Evaluation.aucBootstrapCi(deg, "g").collect().head
    assert(dr.getAs[Long]("n_pos") == 1L)
    assert(dr.isNullAt(dr.fieldIndex("ci_hi_micro")),
      "1-positive group cannot populate the rank-63 bound; expected NULL")
  }

  test("p75: a single-class group keeps its point row with NULL auc and bounds (the p72 contract)") {
    // round 11: p72 emits single-class groups with NULL auc while p75
    // used to drop them entirely — the family now shares one contract
    val df = ((1L to 20L).map(i => (i, "mixed", 0.3 + (i % 7) * 0.1, i % 2)) ++
        (21L to 30L).map(i => (i, "allneg", 0.2 + (i % 5) * 0.1, 0L)))
      .toDF("doc_id", "g", "p_hat", "label")
    val out = Evaluation.aucBootstrapCi(df, "g").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(out.keySet == Set("mixed", "allneg"),
      s"single-class group must keep its point row: ${out.keySet}")
    val an = out("allneg")
    assert(an.getAs[Long]("n_pos") == 0L && an.getAs[Long]("n_neg") == 10L)
    assert(an.isNullAt(an.fieldIndex("auc_micro")), "single-class AUC must be NULL")
    assert(an.isNullAt(an.fieldIndex("ci_lo_micro")) &&
      an.isNullAt(an.fieldIndex("ci_hi_micro")), "single-class bounds must be NULL")
    assert(!out("mixed").isNullAt(out("mixed").fieldIndex("auc_micro")))
    // and the same fixture through aucByGroup agrees on WHICH groups
    // carry a value — one convention across the family
    val byG = Evaluation.aucByGroup(df, "g").collect()
      .map(r => r.getAs[String]("g") -> !r.isNullAt(r.fieldIndex("auc"))).toMap
    assert(byG == Map("mixed" -> true, "allneg" -> false))
  }

  test("p76: k-fold CV — every doc scored once by the complement's model; folds disjoint; deterministic") {
    // a corpus where the quality label is learnable: long clean texts
    // vs short punct-heavy ones (the p57 feature lattice separates)
    val docs = (1L to 300L).map { i =>
      val text = if (i % 2 == 0)
        Seq.fill(20)("the quick brown fox is here and it is good").mkString(" ")
      else "!!! ??? ;;; " * 2
      (i, text)
    }.toDF("doc_id", "text")
    val out = Evaluation.crossValAuc(docs, k = 3, rounds = 2).collect()
      .map(r => r.getAs[Long]("fold") ->
        (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          Option(r.getAs[java.lang.Double]("auc")))).toMap
    assert(out.keySet == Set(0L, 1L, 2L), s"folds: ${out.keySet}")
    // disjoint folds cover the corpus exactly once
    assert(out.values.map { case (p, n, _) => p + n }.sum == 300L)
    // a separable signal must score well OUT OF FOLD on every fold
    out.foreach { case (f, (_, _, auc)) =>
      assert(auc.exists(_ > 0.9), s"fold $f auc $auc — generalization failed")
    }
    val again = Evaluation.crossValAuc(docs, k = 3, rounds = 2).collect()
      .map(r => r.getAs[Long]("fold") ->
        (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          Option(r.getAs[java.lang.Double]("auc")))).toMap
    assert(again == out, "CV must be a deterministic corpus function")
  }

  test("p77: kappa — 1 on identical raters, exactly 0 at chance-level agreement, NULL when both constant") {
    def frame(keeps: Seq[(Long, Boolean)], g: String = "g") =
      keeps.map { case (id, k) => (id, g, k) }.toDF("doc_id", "g", "keep")
    // hand case at CHANCE: A keeps {1,2}, B keeps {1,3} over 4 docs —
    // agree on 1 (keep) and 4 (drop), pe = (2·2+2·2)/16 = 1/2 = po
    val a0 = frame(Seq(1L -> true, 2L -> true, 3L -> false, 4L -> false))
    val b0 = frame(Seq(1L -> true, 2L -> false, 3L -> true, 4L -> false))
    val r0 = Evaluation.agreementKappa(a0, b0, "g").collect().head
    assert(r0.getAs[Long]("n_docs") == 4L && r0.getAs[Long]("n_agree") == 2L)
    assert(r0.getAs[Double]("kappa") == 0.0, s"chance case: ${r0.getAs[Double]("kappa")}")
    // identical non-constant raters: kappa exactly 1 (fresh frame —
    // never a same-lineage self-join)
    val a1 = frame(Seq(1L -> true, 2L -> true, 3L -> false, 4L -> false))
    val r1 = Evaluation.agreementKappa(a0, a1, "g").collect().head
    assert(r1.getAs[Double]("kappa") == 1.0)
    // both raters constant: pe = 1, kappa undefined -> NULL
    val c1 = frame(Seq(1L -> true, 2L -> true, 3L -> true))
    val c2 = frame(Seq(1L -> true, 2L -> true, 3L -> true))
    val rc = Evaluation.agreementKappa(c1, c2, "g").collect().head
    assert(rc.isNullAt(rc.fieldIndex("kappa")))
  }

  test("p83: retrieval eval — hand-checkable recall/MRR; no-system and no-hit queries fail visible") {
    val truth = Seq(
      (1L, 10L), (1L, 11L),            // q1 truth = {10, 11}
      (2L, 20L),                       // q2 truth = {20}
      (3L, 30L))                       // q3: the system never answers
      .toDF("query_id", "neighbor_id")
    val system = Seq(
      (1L, 99L, 1L), (1L, 10L, 2L), (1L, 98L, 3L), // first hit at rank 2
      (2L, 21L, 1L), (2L, 22L, 2L))                // zero hits
      .toDF("query_id", "neighbor_id", "rank")
    val out = Evaluation.retrievalEval(system, truth).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "every truth query must report")
    val q1 = out(1L)
    assert(q1.getAs[Long]("n_truth") == 2L && q1.getAs[Long]("n_system") == 3L)
    assert(q1.getAs[Long]("n_hit") == 1L && q1.getAs[Long]("first_hit_rank") == 2L)
    assert(q1.getAs[Long]("recall_bps") == 5000L, "1 of 2 = 5000 bps")
    assert(q1.getAs[Long]("mrr_micro") == 500000L, "1/2 = 500000 micro")
    val q2 = out(2L)
    assert(q2.getAs[Long]("n_hit") == 0L && q2.getAs[Long]("recall_bps") == 0L)
    assert(q2.isNullAt(q2.fieldIndex("first_hit_rank")))
    assert(q2.getAs[Long]("mrr_micro") == 0L)
    val q3 = out(3L)
    assert(q3.getAs[Long]("n_system") == 0L && q3.getAs[Long]("recall_bps") == 0L,
      "a query the system never answered must report recall 0, not vanish")
  }

  test("p73: bins come from the integer micro grid; means are truncating-exact") {
    val df = Seq(
      (1L, 0.0, 0L), (2L, 0.099999, 0L),   // bin 0
      (3L, 0.1, 0L), (4L, 0.15, 1L),       // bin 1
      (5L, 1.0, 1L))                       // p=1 joins the TOP bin (9)
      .toDF("doc_id", "p_hat", "label")
    val out = Evaluation.calibration(df).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("mean_pred_micro"),
          r.getAs[Long]("frac_pos_micro"))).toMap
    assert(out.keySet == Set(0L, 1L, 9L), s"bins: ${out.keySet}")
    assert(out(0L) == ((2L, 49999L, 0L)))       // (0 + 99999) DIV 2
    assert(out(1L) == ((2L, 125000L, 500000L))) // (100000+150000) DIV 2; 1 of 2 pos
    assert(out(9L) == ((1L, 1000000L, 1000000L)))
  }

  test("p88 guard: a group past the long envelope fails LOUD instead of silently wrapping the kappa lift") {
    // m = 2 raters -> bound = cbrt(9.2e18 / 8) ~ 1.045e6 rows/group;
    // Spark (non-ANSI) would wrap the A*(nm)^2 product silently where
    // an ANSI oracle raises — the guard makes the engine raise too
    val n = 1100000L
    def rater(flip: Long) = spark.range(n)
      .select(col("id").as("doc_id"), lit("g").as("g"),
        ((col("id") + flip) % 2).as("keep"))
    val e = intercept[Exception] {
      Evaluation.fleissKappa(Seq(rater(0L), rater(1L)), "g").collect()
    }
    assert(e.getMessage.contains("exact long envelope"))
    // inside the envelope the statistic computes: two opposite raters
    // agree on NO pair -> pbar = 0
    val ok = Evaluation.fleissKappa(
      Seq(rater(0L).limit(1000), rater(1L).limit(1000)), "g").collect().head
    assert(ok.getAs[Long]("pbar_micro") == 0L)
  }

  test("p85 guard: discordant imbalance past |delta| = 3e6 fails LOUD instead of wrapping chi2") {
    val n = 3000000L
    // A always right, B always wrong -> n_a_only = 3e6, n_b_only = 0
    val a = spark.range(n).select(col("id").as("doc_id"), lit("g").as("g"),
      lit(1L).as("keep"), lit(1L).as("label"))
    val b = spark.range(n).select(col("id").as("doc_id"), lit("g").as("g"),
      lit(0L).as("keep"), lit(1L).as("label"))
    val e = intercept[Exception] {
      Evaluation.mcnemar(a, b, "g").collect()
    }
    assert(e.getMessage.contains("1e6-lift envelope"))
    // inside the envelope the guarded column passes counts through
    val ok = Evaluation.mcnemar(a.limit(10), b.limit(10), "g").collect().head
    assert(ok.getAs[Long]("n_a_only") == 10L &&
      ok.getAs[Long]("chi2_micro") == 10000000L)
  }

  test("p77 guard: a counts row past n = 9e7 fails LOUD instead of silently losing mantissa ulps") {
    // kappaFromCounts takes a COUNTS frame, so the over-envelope case
    // is one literal row — no data-scale fixture needed
    val big = Seq(("g", 100000001L, 50000000L, 50000000L, 50000000L))
      .toDF("g", "n_docs", "n_agree", "n_keep_a", "n_keep_b")
    val e = intercept[Exception] {
      Evaluation.kappaFromCounts(big, Seq("g")).collect()
    }
    assert(e.getMessage.contains("one-division envelope"))
    val ok = Seq(("g", 4L, 4L, 2L, 2L))
      .toDF("g", "n_docs", "n_agree", "n_keep_a", "n_keep_b")
    assert(Evaluation.kappaFromCounts(ok, Seq("g"))
      .collect().head.getAs[Double]("kappa") == 1.0)
  }

  test("p86 tail: pairEval canonicalizes to DISTINCT pairs — duplicate detector rows cannot inflate precision") {
    val truth = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    // the detector emitted (1,2) twice (e.g. two LSH bands fired)
    val sys = Seq((1L, 2L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val r = Evaluation.pairEval(sys, truth).collect().head
    assert(r.getAs[Long]("n_system") == 2L, "duplicate pair must count once")
    assert(r.getAs[Long]("n_truth") == 2L && r.getAs[Long]("n_hit") == 1L)
    assert(r.getAs[Long]("precision_bps") == 5000L)
  }
}
