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
    * groups keep NULL bounds (the a16 convention). Everything replays
    * bit-exactly in SQL.
    *
    * Shape at 100 TB: the explode costs (b+1)× the scan (all map-side,
    * the a16 envelope); the first aggregation collapses to
    * |groups| × (b+1) × |distinct micro scores| rows with map-side
    * partials (micro scores are grid-bounded at ≤ 1e6+1 values), and
    * the cumulative window runs over THAT bounded frame, never the
    * corpus. Integer envelope: U·2 ≤ 2·W⁺·W⁻ ≤ 2·(9n)², and the ×1e6
    * lift needs 2e6·(9n)² < 2^63 — safe to ~7e8 rows per group per
    * resample; shard the group key beyond that.
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
    val aucs = byScore
      .withColumn("cumwn", coalesce(sum(col("wn")).over(wCum), lit(0L)))
      .groupBy(col(group), col("b"))
      .agg(sum(col("wp") * (lit(2L) * col("cumwn") + col("wn"))).as("num2"),
        sum(col("wp")).as("tp"), sum(col("wn")).as("tn"))
      .where(col("tp") > 0 && col("tn") > 0)
      .withColumn("auc_micro", expr("(num2 * 1000000) DIV (2 * tp * tn)"))
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
