package graft.stats

import graft.functions.ErfFn
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spearman p-value columns — the reference's normal-approximation
  * definition (reference: src/etl_for_all_studies/correlation.py:50-61),
  * standardized per SURVEY.md §7.4 decision 2:
  *
  *   t = rho * sqrt((n - 2) / (1 - rho^2))
  *   p = 2 * (1 - Phi(|t|)),  clamped to [0, 1]
  *   p = NaN/null  when n < 3   (not enough df)
  *   p = 0.0       when |rho| >= 1 (perfect monotone)
  *
  * Pure column math over the codegen'd [[graft.functions.Erf]]; no UDF,
  * stays inside whole-stage codegen. At 100 TB this is a map-side
  * expression over the pair-aggregate output — no extra shuffle.
  */
object PValues {

  /** Two-sided p-value for Spearman rho with n samples. Null when n < 3. */
  def spearmanP(rho: Column, n: Column): Column = {
    val absRho = abs(rho)
    val t = rho * sqrt((n.cast("double") - lit(2.0)) / (lit(1.0) - rho * rho))
    val p = lit(2.0) * (lit(1.0) - ErfFn.normCdf(abs(t)))
    val clamped = least(greatest(p, lit(0.0)), lit(1.0))
    when(n < 3, lit(null).cast("double"))
      .when(absRho >= 1.0, lit(0.0))
      .otherwise(clamped)
  }

  /** Exact (Student-t) two-sided Spearman p-value — the reference's
    * PRIMARY path (scipy.stats.spearmanr, correlation.py:11-12,128):
    * p = P(|T_{n-2}| >= |t|) via the regularized incomplete beta
    * ([[graft.functions.StudentTFn]], codegen'd). Same gates as the
    * approx path: null when n < 3, 0 at |rho| >= 1. Opt in where scipy
    * parity at small n matters; the normal approximation overstates
    * tail p by up to ~0.05 absolute at n = 5 and converges by n ≈ 30
    * (measured in StatsSpec's property test).
    */
  def spearmanPExact(rho: Column, n: Column): Column = {
    val absRho = abs(rho)
    val t = rho * sqrt((n.cast("double") - lit(2.0)) / (lit(1.0) - rho * rho))
    val p = graft.functions.StudentTFn(abs(t), n.cast("double") - lit(2.0))
    val clamped = least(greatest(p, lit(0.0)), lit(1.0))
    when(n < 3, lit(null).cast("double"))
      .when(absRho >= 1.0, lit(0.0))
      .otherwise(clamped)
  }
}
