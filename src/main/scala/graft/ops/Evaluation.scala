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
