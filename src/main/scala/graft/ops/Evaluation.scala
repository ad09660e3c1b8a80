package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Classifier evaluation — the measurement half the trained-model
  * family (p57/p62/p70) feeds: exact ROC AUC and a calibration
  * (reliability) table, both engine-exact by construction so model
  * regressions surface as oracle failures, not as drifting floats.
  *
  * AUC uses the rank-sum (Mann–Whitney) identity
  * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻) with tie-AVERAGED ranks — the
  * standard ties-count-half AUC, and exactly the C1 fractional-rank
  * machinery ([[graft.stats.Ranks]]): one window shuffle per group,
  * no pairwise positive×negative join (the naive AUC is O(n⁺·n⁻);
  * this is O(n log n) and distributes as one sort). Fractional ranks
  * are exact multiples of ½, so their sum is EXACT in doubles (no
  * order dependence) up to 2^52 — corpus-scale safe; the single
  * division + 6-dp round is the only float site.
  *
  * The calibration table stays entirely on the integer micro grid:
  * bins derive from the micro p-hat by integer division, per-bin
  * means use truncating DIV — bit-replayable on any engine and any
  * partitioning. At 100 TB both are one scan + one bounded
  * aggregation (AUC adds the per-group sort).
  */
object Evaluation {

  /** Per-group exact AUC of `score` against binary `label`:
    * (group, n_pos, n_neg, auc — null when a class is absent).
    * n⁺(n⁺+1) runs in doubles: exact to n⁺ < 2^26 per group, ~1e-16
    * relative beyond — far under the 6-dp grid either way.
    */
  def aucByGroup(scored: DataFrame, group: String,
      score: String = "p_hat", label: String = "label"): DataFrame = {
    val base = scored.select(col(group), col(score).as("__s"),
      col(label).cast("long").as("__y"))
    val ranked = graft.stats.Ranks.fractionalRank(
      base, Seq(col(group)), col("__s"), "__r")
    ranked.groupBy(col(group))
      .agg(
        sum(when(col("__y") === 1L, col("__r")).otherwise(0.0)).as("__rpos"),
        sum(when(col("__y") === 1L, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("__y") =!= 1L, 1L).otherwise(0L)).as("n_neg"))
      .select(col(group), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("__rpos") -
              col("n_pos").cast("double") * (col("n_pos").cast("double") + 1.0) / 2.0) /
            (col("n_pos").cast("double") * col("n_neg").cast("double")), 6))
          .otherwise(lit(null).cast("double")).as("auc"))
  }

  /** k-fold cross-validated AUC — the model-SELECTION layer over the
    * trained-classifier family: a single train-on-everything AUC
    * (p72) is optimistically biased by memorization; the honest
    * generalization estimate trains k models on fold complements and
    * scores each model ONLY on its held-out fold. Folds are the
    * deterministic `doc_id % k` cohorts (hash-free, oracle-trivial);
    * every document is scored exactly once, by the one model that
    * never saw it, and per-fold AUC runs through [[aucByGroup]]'s
    * rank-sum identity. Fold-to-fold AUC spread is itself the
    * diagnostic: a large spread means the quality signal is unstable
    * under resampling.
    *
    * Shape at 100 TB: the feature frame materializes ONCE
    * (localCheckpoint) and is reused by all k trainings — k × rounds
    * bounded gradient aggregations (each a map-side-combined scan of
    * the checkpointed features, the p57 envelope), then ONE scoring
    * pass over the union of disjoint folds (= one corpus pass) and
    * one rank window per fold. k is single-digit by construction.
    */
  def crossValAuc(docs: DataFrame, k: Int = 3, rounds: Int = 3,
      lrNum: Long = 4L): DataFrame = {
    require(k >= 2, s"need at least 2 folds, got $k")
    // spread before the regex-heavy featurization (single-split trap)
    val feat = Logistic.features(Logistic.spread(docs)).localCheckpoint(true)
    val scored = (0 until k).map { f =>
      val w = Logistic.train(feat.where(col("doc_id") % k =!= f), rounds, lrNum)
      Logistic.scoreWith(feat.where(col("doc_id") % k === f), w)
        .withColumn("fold", lit(f.toLong))
    }.reduce(_ unionByName _)
    aucByGroup(scored, "fold")
  }

  /** Per-group AUC with a Poisson-bootstrap confidence interval — the
    * p72 × a16 composition: model comparison needs the uncertainty of
    * the AUC, not just its point value, and the bootstrap of a RANK
    * statistic must resample the rank-sum, never the O(n⁺·n⁻) pairs.
    *
    * The resampled AUC uses the weighted Mann–Whitney identity
    * directly: with per-row replication weights w (Poisson(1) from the
    * a16 integer inverse-CDF; w ≡ 1 is the point estimate), group by
    * the integer micro score and take, per distinct score s,
    * wp(s) = Σ_{y=1, score=s} w and wn(s) likewise for negatives; then
    *   U·2 = Σ_s wp(s) · (2·Σ_{s'<s} wn(s') + wn(s))
    * — ties count half, in INTEGER arithmetic throughout (the ×2
    * clears the half), and auc_micro = (U·2 · 1e6) DIV (2·W⁺·W⁻).
    * The CI bounds are the [[Bootstrap.ciRanks]] order statistics of
    * the b resample auc_micros; a group whose resample drops a whole
    * class contributes no mean for that resample, and under-populated
    * groups keep NULL bounds (the a16 convention). A group that is
    * single-class in the DATA keeps its point row with NULL auc_micro
    * and NULL bounds — the [[aucByGroup]] convention, so the p72 and
    * p75 members of the family share one output contract. Everything
    * replays bit-exactly in SQL.
    *
    * Shape at 100 TB: the explode costs (b+1)× the scan (all map-side,
    * the a16 envelope); the first aggregation collapses to
    * |groups| × (b+1) × |distinct micro scores| rows with map-side
    * partials (micro scores are grid-bounded at ≤ 1e6+1 values), and
    * the cumulative window runs over THAT bounded frame, never the
    * corpus. Integer envelope: U·2 ≤ 2·W⁺·W⁻, with W⁺+W⁻ ≤ 9n (the
    * Poisson weight caps at 9), so the ×1e6 lift needs
    * 2e6·W⁺·W⁻ < 2^63 ⇔ W⁺·W⁻ < ~4.6e12 — worst case (adversarially
    * split all-9 weights, W⁺=W⁻=9n/2) that is n ≈ 4.8e5 rows per group
    * per resample; at typical Poisson(1) mass (W⁺+W⁻ ≈ n) and balanced
    * classes it is n ≈ 4.3e6. Because the bound depends on the CLASS
    * SPLIT, not just n, the guard is enforced at RUNTIME: any (group,
    * resample) whose W⁺·W⁻ would overflow the lift raises an error
    * (never a silently wrapped CI) — shard the group key beyond.
    */
  def aucBootstrapCi(scored: DataFrame, group: String, b: Int = 64,
      score: String = "p_hat", label: String = "label",
      id: String = "doc_id"): DataFrame = {
    require(b >= 4, s"need at least 4 resamples for an interval, got $b")
    val (rnLo, rnHi) = Bootstrap.ciRanks(b)
    val base = scored.select(col(id), col(group),
      round(col(score) * 1e6).cast("long").as("sm"),
      col(label).cast("long").as("y"))
    // resample -1 carries w = 1: the point estimate rides the same
    // plan as the ensemble instead of a second scan
    val u = Hashing.hex64(concat_ws("-",
      col(id).cast("string"), col("b").cast("string"), lit("boot"))) % 1000000L
    val rep = base
      .select(col(group), col("sm"), col("y"),
        explode(sequence(lit(-1), lit(b - 1))).as("b"), col(id))
      .withColumn("w",
        when(col("b") === -1L, lit(1L)).otherwise(Bootstrap.poissonWeight(u)))
    val byScore = rep.groupBy(col(group), col("b"), col("sm"))
      .agg(sum(when(col("y") === 1L, col("w")).otherwise(0L)).as("wp"),
        sum(when(col("y") =!= 1L, col("w")).otherwise(0L)).as("wn"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group), col("b")).orderBy(col("sm").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // num2 <= 2*tp*tn, so guarding the product guards the whole lift;
    // the compare runs in doubles (slack is fine for a guard) because
    // 2*tp*tn itself can wrap long before the threshold comparison
    val lifted = when(
      col("tp").cast("double") * col("tn").cast("double") >= 4.6e12,
      raise_error(concat(
        lit("aucBootstrapCi: W+*W- exceeds the exact 1e6-lift envelope in group "),
        col(group).cast("string"), lit(", resample "), col("b").cast("string"),
        lit(" — shard the group key"))).cast("long"))
      .otherwise(expr("(num2 * 1000000) DIV (2 * tp * tn)"))
    val aucs = byScore
      .withColumn("cumwn", coalesce(sum(col("wn")).over(wCum), lit(0L)))
      .groupBy(col(group), col("b"))
      .agg(sum(col("wp") * (lit(2L) * col("cumwn") + col("wn"))).as("num2"),
        sum(col("wp")).as("tp"), sum(col("wn")).as("tn"))
      // single-class RESAMPLES contribute no mean; the single-class
      // POINT row (b = -1) survives with NULL auc (the p72 contract)
      .where(col("b") === -1L || (col("tp") > 0 && col("tn") > 0))
      .withColumn("auc_micro",
        when(col("tp") > 0 && col("tn") > 0, lifted)
          .otherwise(lit(null).cast("long")))
      // groups × (b+2) rows feeding three consumers (point, lo, hi) —
      // materialized eagerly or the whole explode+rank-sum subtree
      // (including the upstream scoring pass) executes once per
      // consumer (the Bootstrap.meanCi rationale; plan audit measured
      // 3 corpus passes here too). Bounded driver-free state.
      .localCheckpoint(true)
    val point = aucs.where(col("b") === -1L)
      .select(col(group), col("tp").as("n_pos"), col("tn").as("n_neg"),
        col("auc_micro"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group)).orderBy(col("auc_micro").asc, col("b").asc)
    val ranked = aucs.where(col("b") >= 0L)
      .withColumn("rn", row_number().over(wr))
    point
      .join(ranked.where(col("rn") === rnLo)
        .select(col(group), col("auc_micro").as("ci_lo_micro")),
        Seq(group), "left")
      .join(ranked.where(col("rn") === rnHi)
        .select(col(group), col("auc_micro").as("ci_hi_micro")),
        Seq(group), "left")
  }

  /** Cohen's kappa between two binary raters (chance-corrected
    * agreement) per group — the ensembling diagnostic for the trained
    * classifier family: raw percent-agreement between two quality
    * models is inflated by class imbalance (two raters that both keep
    * 95% of documents agree 90%+ by CHANCE); kappa subtracts the
    * chance term pe = (r₁c₁ + r₀c₀)/n², so kappa ≈ 0 means the models
    * bring no shared signal beyond their marginals and ensembling
    * them is pointless, while high kappa justifies cheap
    * agreement-gated routing (only disagreements go to the expensive
    * adjudicator). Emits (group, n_docs, n_agree, kappa) — kappa NULL
    * when both raters are constant (pe = 1, the undefined case).
    *
    * Exactness: all counts are exact integer sums off ONE
    * co-partitioned equi-join on the id (each side one shuffle, then
    * map-side-combined aggregation); kappa = (n·a − pe·n²)/(n² − pe·n²)
    * evaluated as a single division of exactly-representable longs —
    * the p72 one-float-site discipline. n ≤ 9e7 per group keeps n²
    * inside the 2^53 mantissa; shard beyond.
    */
  def agreementKappa(a: DataFrame, b: DataFrame, group: String,
      id: String = "doc_id", keep: String = "keep"): DataFrame = {
    val l = a.select(col(id), col(group), col(keep).cast("long").as("__ka"))
    val r = b.select(col(id), col(keep).cast("long").as("__kb"))
    val ag = l.join(r, Seq(id))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__ka") === col("__kb"), 1L).otherwise(0L)).as("n_agree"),
        sum(col("__ka")).as("n_keep_a"), sum(col("__kb")).as("n_keep_b"))
    kappaFromCounts(ag, Seq(group))
  }

  /** McNemar's paired test between two classifiers scored on the SAME
    * documents — the significance half the p77 kappa deliberately does
    * not answer: kappa says whether two raters share signal;
    * McNemar says whether one is BETTER, and on paired predictions
    * only the DISCORDANT cells carry that information (n_a_only =
    * A right ∧ B wrong, n_b_only = the reverse — the concordant
    * diagonal cancels out of the test entirely, which is why the
    * unpaired two-proportion z-test over the same data is wrong).
    * Emits per group the paired contingency and two statistics on the
    * integer micro grid:
    *   chi2_micro   = ((n_a_only − n_b_only)² · 1e6) DIV (n_a_only + n_b_only)
    *   chi2cc_micro = the Edwards continuity-corrected variant
    *                  ((|Δ| − 1)₊² · 1e6) DIV (n_a_only + n_b_only)
    * (reject at ~3.84 ⇔ 3 840 000 micro for α = 0.05, 1 df), both
    * NULL when no discordant pairs exist (the test is undefined, not
    * zero — the fail-visible gate).
    *
    * Exactness: all cells are integer sums off ONE co-partitioned
    * equi-join on the id; the statistics are single integer DIVs —
    * bit-replayable on any engine/partitioning. Envelope:
    * Δ²·1e6 < 2^63 ⇔ |Δ| < 3e6 discordant-pair imbalance per group;
    * GUARDED loud (raise_error) past the bound — shard the group key.
    *
    * Shape at 100 TB: one shuffle per side on the id, map-side-combined
    * aggregation to |groups| rows — the agreementKappa envelope exactly.
    */
  def mcnemar(a: DataFrame, b: DataFrame, group: String,
      id: String = "doc_id", keep: String = "keep",
      label: String = "label"): DataFrame = {
    def right(out: String) = (col(keep).cast("long") === col(label).cast("long"))
      .cast("long").as(out)
    val l = a.select(col(id), col(group), right("__ra"))
    val r = b.select(col(id), right("__rb"))
    val ag = l.join(r, Seq(id)).groupBy(col(group))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ra")).as("n_right_a"),
        sum(col("__rb")).as("n_right_b"),
        sum(when(col("__ra") === 1L && col("__rb") === 0L, 1L)
          .otherwise(0L)).as("n_a_only"),
        sum(when(col("__ra") === 0L && col("__rb") === 1L, 1L)
          .otherwise(0L)).as("n_b_only"))
    // Δ²·1e6 wraps a long at |Δ| ≥ ~3e6 — Spark (non-ANSI) would wrap
    // silently where an ANSI oracle raises. Fail loud instead (the
    // documented envelope, now enforced).
    val guardedDisc = when(
      abs(col("n_a_only") - col("n_b_only")) >= 3000000L,
      raise_error(concat(
        lit("mcnemar: discordant-pair imbalance |n_a_only - n_b_only| "),
        lit("exceeds the exact 1e6-lift envelope (3e6) in group "),
        col(group).cast("string"), lit(" — shard the group key"))).cast("long"))
      .otherwise(col("__disc"))
    ag.withColumn("__disc", col("n_a_only") + col("n_b_only"))
      .withColumn("__disc", guardedDisc)
      .withColumn("__cc",
        greatest(abs(col("n_a_only") - col("n_b_only")) - lit(1L), lit(0L)))
      .select(col(group), col("n_docs"), col("n_right_a"), col("n_right_b"),
        col("n_a_only"), col("n_b_only"),
        when(col("__disc") > 0L, expr(
          "((n_a_only - n_b_only) * (n_a_only - n_b_only) * 1000000) DIV __disc"))
          .otherwise(lit(null).cast("long")).as("chi2_micro"),
        when(col("__disc") > 0L, expr("(__cc * __cc * 1000000) DIV __disc"))
          .otherwise(lit(null).cast("long")).as("chi2cc_micro"))
  }

  /** Fleiss' kappa — [[agreementKappa]] generalized to m raters: with
    * three or more quality models voting keep/drop on the same corpus
    * (the ensemble-routing setup p77 serves for two), pairwise kappas
    * miss the joint structure; Fleiss scores the chance-corrected
    * agreement of the whole panel in one statistic. Per item,
    * k = keep-votes; the agreement mass is
    * P_i = [k(k−1) + (m−k)(m−k−1)] / (m(m−1)) — the fraction of rater
    * PAIRS that agree — and
    *   kappa = (P̄ − P̄e) / (1 − P̄e),  P̄e = p² + q²
    * over the pooled keep share p. Emits per group: n_docs,
    * n_keep_votes, pbar_micro, pe_micro (integer DIVs) and the 6-dp
    * kappa — NULL when the panel is unanimous-constant (P̄e = 1, the
    * undefined case, the agreementKappa convention).
    *
    * Exactness: the per-item vote count k comes off one m-way
    * co-partitioned id equi-join; A = Σ[k(k−1)+(m−k)(m−k−1)] and
    * K = Σk are exact integer sums, and kappa is ONE division of two
    * exactly-representable longs:
    *   num = A·(nm)² − nm(m−1)·(K² + (nm−K)²)
    *   den = nm(m−1)·((nm)² − K² − (nm−K)²).
    * Envelope: num ≤ m(m−1)·(nm)²·n ≈ 54n³ at m = 3 ⇒ n < ~5.5e5 rows
    * per group keeps the lift in a long — GUARDED loud (raise_error)
    * past the bound; shard the group key beyond.
    *
    * Shape at 100 TB: m−1 co-partitioned equi-joins on the id (each
    * side one shuffle) + one map-side-combined aggregation to
    * |groups| rows; no window. m is panel-sized (single digits).
    */
  def fleissKappa(raters: Seq[DataFrame], group: String,
      id: String = "doc_id", keep: String = "keep"): DataFrame = {
    val m = raters.size
    require(m >= 2, s"Fleiss' kappa needs at least 2 raters, got $m")
    val head = raters.head.select(col(id), col(group),
      col(keep).cast("long").as("__k0"))
    val joined = raters.tail.zipWithIndex.foldLeft(head) {
      case (acc, (r, i)) =>
        acc.join(r.select(col(id), col(keep).cast("long").as(s"__k${i + 1}")),
          Seq(id))
    }
    val mL = m.toLong
    val ki = (0 until m).map(i => col(s"__k$i")).reduce(_ + _)
    // the kappa numerator A·(nm)² grows ~m³(m−1)·n³ — past the long
    // envelope Spark (non-ANSI) would WRAP silently while an ANSI
    // oracle raises, a silent engine/oracle split. Fail loud instead
    // (the aucBootstrapCi convention): n³ < 2^63 / (m³(m−1)) per group.
    val nBound = math.cbrt(9.2e18 / (mL * mL * mL * (mL - 1L)).toDouble).toLong
    val guardedN = when(col("n_docs") > nBound,
      raise_error(concat(
        lit("fleissKappa: group "), col(group).cast("string"),
        lit(s" has more than $nBound rows — the exact long envelope at m=$m; "),
        lit("shard the group key"))).cast("long"))
      .otherwise(col("n_docs"))
    joined.withColumn("__ki", ki)
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ki")).as("n_keep_votes"),
        sum(col("__ki") * (col("__ki") - 1L) +
          (lit(mL) - col("__ki")) * (lit(mL - 1L) - col("__ki"))).as("__A"))
      .withColumn("__nm", guardedN * mL)
      .withColumn("__pe2",
        col("n_keep_votes") * col("n_keep_votes") +
          (col("__nm") - col("n_keep_votes")) * (col("__nm") - col("n_keep_votes")))
      .withColumn("__nmm1", col("n_docs") * lit(mL * (mL - 1L)))
      .withColumn("__den",
        col("__nmm1") * (col("__nm") * col("__nm") - col("__pe2")))
      .select(col(group), col("n_docs"), col("n_keep_votes"),
        expr("(__A * 1000000) DIV __nmm1").as("pbar_micro"),
        expr("(__pe2 * 1000000) DIV (__nm * __nm)").as("pe_micro"),
        when(col("__den") =!= 0L,
          round((col("__A") * col("__nm") * col("__nm") -
            col("__nmm1") * col("__pe2")).cast("double") /
            col("__den").cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("kappa"))
  }

  /** Event-time-windowed agreement contingency — the STREAMING half of
    * the x31 monitor, factored here so the production query and the
    * eviction spec execute ONE definition (the kappaFromCounts
    * discipline applied to the state shape too). Works on bounded and
    * unbounded frames alike: on a stream the watermark bounds state —
    * a window whose end falls `lateness` behind the max observed event
    * time is finalized, its 4 longs emitted and EVICTED from the state
    * store (update mode; WatermarkEvictionSpec pins numRowsRemoved > 0
    * on RocksDB); on a batch frame the watermark is a no-op and the
    * same aggregation is one map-side-combined pass. State is exactly
    * 4 longs per open window at any throughput.
    */
  def windowedAgreementCounts(scored: DataFrame,
      eventTs: String = "event_ts", windowDur: String = "256 seconds",
      lateness: String = "64 seconds",
      keepA: String = "keep_a", keepB: String = "keep_b"): DataFrame =
    scored.withWatermark(eventTs, lateness)
      .groupBy(window(col(eventTs), windowDur).as("w"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col(keepA) === col(keepB), 1L).otherwise(0L)).as("n_agree"),
        sum(col(keepA).cast("long")).as("n_keep_a"),
        sum(col(keepB).cast("long")).as("n_keep_b"))

  /** Latest-update-wins drain for an UPDATE-mode sink of
    * [[windowedAgreementCounts]] rows: a window's successive updates
    * carry strictly growing n_docs (a batch that adds no rows emits no
    * update), so the lexicographic struct max per window IS its final
    * contingency — the x20/x30 monotone-drain discipline applied to
    * counts.
    */
  def drainLatestWindowCounts(updates: DataFrame): DataFrame =
    updates.groupBy(col("w"))
      .agg(max(struct(col("n_docs"), col("n_agree"),
        col("n_keep_a"), col("n_keep_b"))).as("last"))
      .select(col("w"), col("last.n_docs").as("n_docs"),
        col("last.n_agree").as("n_agree"),
        col("last.n_keep_a").as("n_keep_a"),
        col("last.n_keep_b").as("n_keep_b"))

  /** Closed-form kappa from an exact contingency frame
    * (groups..., n_docs, n_agree, n_keep_a, n_keep_b) — ONE
    * definition shared by the batch rater-pair op ([[agreementKappa]])
    * and the x31 streaming monitor, whose state is exactly this
    * counts frame (4 longs per window): batch and stream kappa cannot
    * drift. NULL when both raters are constant (pe = 1).
    */
  def kappaFromCounts(counts: DataFrame, groups: Seq[String]): DataFrame = {
    val pe = col("n_keep_a") * col("n_keep_b") +
      (col("n_docs") - col("n_keep_a")) * (col("n_docs") - col("n_keep_b"))
    val den = col("n_docs") * col("n_docs") - pe
    // the one-division exactness contract needs n² inside the 2^53
    // double mantissa — n ≤ 9e7 per group, GUARDED loud (round 12, the
    // documented-envelope convention) instead of silently losing ulps
    val guardedDen = when(col("n_docs") > 90000000L,
      raise_error(concat(
        lit("kappaFromCounts: group of "), col("n_docs").cast("string"),
        lit(" docs exceeds the exact one-division envelope (9e7) — "),
        lit("shard the group key"))).cast("long"))
      .otherwise(den)
    counts.select(groups.map(col) :+ col("n_docs") :+ col("n_agree") :+
      when(guardedDen =!= 0L,
        round((col("n_docs") * col("n_agree") - pe).cast("double") /
          den.cast("double"), 6))
        .otherwise(lit(null).cast("double")).as("kappa"): _*)
  }

  /** Retrieval-quality evaluation of an ANN system against exact
    * ground truth — the metric layer the similarity family (p6/p13/
    * p64/p66) is tuned BY: recall floors in specs pin a minimum, this
    * emits the per-query audit a production index rollout watches.
    * Per query: n_truth, n_system, n_hit (system results that are true
    * neighbors), first_hit_rank, recall_bps = (n_hit·10⁴) DIV n_truth,
    * and MRR's per-query term mrr_micro = 10⁶ DIV first_hit_rank (0
    * when the system never hits) — all integer, bit-replayable; the
    * corpus-level MRR/recall are plain averages of these columns.
    *
    * Shape at 100 TB: ground truth is an eval PANEL (labeled queries ×
    * k), bounded by construction — it broadcasts; the system frame is
    * |queries|·k rows; one left join on (query, neighbor) + one
    * query-keyed map-side-combined aggregation. A query in the truth
    * panel with NO system rows still reports (recall 0, the
    * fail-visible gate).
    */
  def retrievalEval(system: DataFrame, truth: DataFrame,
      queryId: String = "query_id", neighborId: String = "neighbor_id",
      rank: String = "rank"): DataFrame = {
    val sys = system.select(col(queryId), col(neighborId),
      col(rank).cast("long").as("__sr"))
    val tru = truth.select(col(queryId), col(neighborId), lit(1L).as("__hit"))
    val nTruth = tru.groupBy(col(queryId)).agg(count(lit(1)).as("n_truth"))
    val perQ = sys.join(broadcast(tru), Seq(queryId, neighborId), "left")
      .groupBy(col(queryId))
      .agg(count(lit(1)).as("n_system"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_hit"),
        min(when(col("__hit").isNotNull, col("__sr"))).as("first_hit_rank"))
    nTruth.join(perQ, Seq(queryId), "left")
      .select(col(queryId), col("n_truth"),
        coalesce(col("n_system"), lit(0L)).as("n_system"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        col("first_hit_rank"),
        expr("(coalesce(n_hit, 0) * 10000) DIV n_truth").as("recall_bps"),
        when(col("first_hit_rank").isNotNull,
          expr("1000000 DIV first_hit_rank"))
          .otherwise(lit(0L)).as("mrr_micro"))
  }

  /** Per-subgroup classifier audit — the parity layer a corpus-gating
    * model ships with: a keep/drop classifier that is well-calibrated
    * POOLED can still gate one source/language far harder than the
    * rest (disparate error rates), and the pooled AUC (p72) is blind
    * to it by construction. Emits per group the exact integer
    * confusion (tp/fp/tn/fn), the rates on the bps grid
    * (tpr = tp·10⁴ DIV positives, fpr, acc — each NULL when its
    * denominator is empty, the fail-visible gate), and the PARITY
    * GAPS tpr_gap_bps / fpr_gap_bps against the pooled rates —
    * integer differences of integer bps, so the audit is
    * bit-replayable and a fairness regression shows up as an oracle
    * failure, not a drifting float.
    *
    * Shape at 100 TB: scoring is the p57 map-only pass; ONE
    * map-side-combined group aggregation to |groups| rows; the pooled
    * row is a 1-row aggregate of THAT frame (never a second corpus
    * pass) broadcast back onto it. Nothing after the scan exceeds the
    * group table.
    */
  def subgroupAudit(scored: DataFrame, group: String,
      keep: String = "keep", label: String = "label"): DataFrame =
    parityFromCounts(confusionCounts(scored, Seq(col(group)), keep, label),
      Seq(group), Seq.empty)

  /** Exact integer confusion per key tuple — the state shape shared
    * by the batch audit ([[subgroupAudit]]) and the x33 streaming
    * monitor (whose per-window state is exactly this frame: 5 longs
    * per (window, group)).
    */
  def confusionCounts(scored: DataFrame, keys: Seq[Column],
      keep: String = "keep", label: String = "label"): DataFrame = {
    val k = col(keep).cast("long")
    val y = col(label).cast("long")
    scored.groupBy(keys: _*).agg(
      count(lit(1)).as("n_docs"),
      sum(when(k === 1L && y === 1L, 1L).otherwise(0L)).as("tp"),
      sum(when(k === 1L && y === 0L, 1L).otherwise(0L)).as("fp"),
      sum(when(k === 0L && y === 0L, 1L).otherwise(0L)).as("tn"),
      sum(when(k === 0L && y === 1L, 1L).otherwise(0L)).as("fn"))
  }

  /** [[confusionCounts]] as watermark-bounded streaming state — the
    * x31 discipline at parity arity: per (event-time window, group)
    * confusion updates in UPDATE mode, closed windows EVICT (the
    * family's eviction measured by WatermarkEvictionSpec), state is
    * exactly 5 longs per open (window, group).
    */
  def windowedConfusionCounts(scored: DataFrame, group: String,
      eventTs: String = "event_ts", windowDur: String = "256 seconds",
      lateness: String = "64 seconds",
      keep: String = "keep", label: String = "label"): DataFrame =
    confusionCounts(scored.withWatermark(eventTs, lateness),
      Seq(window(col(eventTs), windowDur).as("w"), col(group)), keep, label)

  /** Latest-update-wins drain for an UPDATE-mode sink of
    * [[windowedConfusionCounts]] rows — n_docs grows strictly per
    * (window, group) update, so the lexicographic struct max is the
    * final state (the x20/x31 monotone-drain discipline).
    */
  def drainLatestConfusion(updates: DataFrame, group: String): DataFrame =
    updates.groupBy(col("w"), col(group))
      .agg(max(struct(col("n_docs"), col("tp"), col("fp"),
        col("tn"), col("fn"))).as("last"))
      .select(col("w"), col(group), col("last.n_docs").as("n_docs"),
        col("last.tp").as("tp"), col("last.fp").as("fp"),
        col("last.tn").as("tn"), col("last.fn").as("fn"))

  /** The parity tail shared by batch p89 and the x33 monitor: bps
    * rates with empty-denominator NULL gates and integer gaps against
    * the POOLED rates — pooled over `pooledKeys` (empty = one global
    * pooled row; the monitor pools per window so each window carries
    * its own yardstick). Everything runs on the counts frame —
    * |keys| rows, never the corpus.
    */
  def parityFromCounts(counts: DataFrame, keys: Seq[String],
      pooledKeys: Seq[String]): DataFrame = {
    val pSums = Seq(sum(col("tp")).as("__ptp"), sum(col("fp")).as("__pfp"),
      sum(col("tn")).as("__ptn"), sum(col("fn")).as("__pfn"))
    val pooled =
      if (pooledKeys.isEmpty) counts.agg(pSums.head, pSums.tail: _*)
      else counts.groupBy(pooledKeys.map(col): _*).agg(pSums.head, pSums.tail: _*)
    val joined =
      if (pooledKeys.isEmpty) counts.crossJoin(broadcast(pooled))
      else counts.join(broadcast(pooled), pooledKeys)
    joined
      .withColumn("tpr_bps",
        when(col("tp") + col("fn") > 0L, expr("(tp * 10000) DIV (tp + fn)"))
          .otherwise(lit(null).cast("long")))
      .withColumn("fpr_bps",
        when(col("fp") + col("tn") > 0L, expr("(fp * 10000) DIV (fp + tn)"))
          .otherwise(lit(null).cast("long")))
      .withColumn("acc_bps", expr("((tp + tn) * 10000) DIV n_docs"))
      .withColumn("__pooled_tpr",
        when(col("__ptp") + col("__pfn") > 0L,
          expr("(__ptp * 10000) DIV (__ptp + __pfn)")))
      .withColumn("__pooled_fpr",
        when(col("__pfp") + col("__ptn") > 0L,
          expr("(__pfp * 10000) DIV (__pfp + __ptn)")))
      .select(keys.map(col) ++ Seq(col("n_docs"), col("tp"), col("fp"),
        col("tn"), col("fn"), col("tpr_bps"), col("fpr_bps"), col("acc_bps"),
        (col("tpr_bps") - col("__pooled_tpr")).as("tpr_gap_bps"),
        (col("fpr_bps") - col("__pooled_fpr")).as("fpr_gap_bps")): _*)
  }

  /** Pair-relation evaluation — [[retrievalEval]]'s discipline applied
    * to the DEDUP family: an approximate near-dup detector (MinHash
    * LSH, SimHash, blocked) audited against the exact pair relation on
    * the same corpus. Emits ONE row: n_system, n_truth, n_hit and the
    * integer-bps precision / recall / F1 — the three numbers every
    * LSH knob (hashes, band width, threshold) is tuned against, as a
    * first-class query instead of a spec-only floor. Empty sides gate
    * their ratio to NULL (undefined, not zero — the fail-visible
    * convention); F1 = (2·hit·10⁴) DIV (sys+truth) is the harmonic
    * mean in exact integer form.
    *
    * Shape at 100 TB: both inputs are PAIR relations (near-dup-bounded,
    * ≪ corpus); the exact truth side is computed over a bounded audit
    * panel — running exact Jaccard corpus-wide is precisely what the
    * approximate detector exists to avoid, so the production eval
    * samples a panel the exact relation stays tractable on. One
    * full-outer equi-join on the canonical (id_a < id_b) pair key +
    * one 1-row aggregation.
    */
  def pairEval(system: DataFrame, truth: DataFrame,
      idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    // canonicalize to DISTINCT pairs: a duplicate (id_a, id_b) row in
    // either input would inflate its count AND multiply n_hit through
    // the equi-join. Pair relations are detector output — small by
    // contract — so the distinct is cheap insurance, not a data-scale
    // shuffle (and a no-op for already-distinct callers).
    val s = system.select(col(idA), col(idB)).distinct().withColumn("__s", lit(1L))
    val t = truth.select(col(idA), col(idB)).distinct().withColumn("__t", lit(1L))
    s.join(t, Seq(idA, idB), "full_outer")
      .agg(sum(col("__s")).as("n_system"), sum(col("__t")).as("n_truth"),
        sum(when(col("__s").isNotNull && col("__t").isNotNull, 1L)
          .otherwise(0L)).as("n_hit"))
      .select(coalesce(col("n_system"), lit(0L)).as("n_system"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("precision_bps",
        when(col("n_system") > 0L, expr("(n_hit * 10000) DIV n_system"))
          .otherwise(lit(null).cast("long")))
      .withColumn("recall_bps",
        when(col("n_truth") > 0L, expr("(n_hit * 10000) DIV n_truth"))
          .otherwise(lit(null).cast("long")))
      .withColumn("f1_bps",
        when(col("n_system") + col("n_truth") > 0L,
          expr("(2 * n_hit * 10000) DIV (n_system + n_truth)"))
          .otherwise(lit(null).cast("long")))
  }

  /** Calibration (reliability) table over `nBins` equal p-hat bins:
    * (bin, n_docs, mean_pred_micro, frac_pos_micro). A well-
    * calibrated model has mean_pred_micro ≈ frac_pos_micro per bin.
    * Bins come from the INTEGER micro p-hat (bin = m DIV (1e6/nBins),
    * capped at nBins−1 so p-hat = 1 joins the top bin) — no float
    * boundary anywhere.
    */
  def calibration(scored: DataFrame, nBins: Int = 10,
      score: String = "p_hat", label: String = "label"): DataFrame = {
    require(nBins >= 2 && 1000000 % nBins == 0,
      s"nBins must divide the 1e6 micro grid, got $nBins")
    val width = 1000000L / nBins
    val m = round(col(score) * 1e6).cast("long")
    scored
      .select(m.as("__m"), col(label).cast("long").as("__y"))
      .withColumn("bin",
        least(expr(s"__m DIV $width"), lit(nBins - 1L)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__m")).as("__sm"),
        sum(col("__y")).as("__sy"))
      .select(col("bin"), col("n_docs"),
        expr("__sm DIV n_docs").as("mean_pred_micro"),
        expr("(__sy * 1000000) DIV n_docs").as("frac_pos_micro"))
  }
}
