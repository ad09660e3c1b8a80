package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring — the check a production pipeline
  * runs before trusting a new data drop: has the value distribution
  * moved against the reference corpus? The metric is the Population
  * Stability Index over a FIXED literal bin grid,
  * PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i), the standard
  * train-vs-serving drift score (PSI < 0.1 stable, > 0.25 shifted).
  *
  * The grid is literal (the a8 histogram discipline): a data-dependent
  * grid (quantile bins) would need its own pass AND make the score
  * incomparable across drops — the whole point is a fixed yardstick.
  *
  * Scale: binning is per-row math on each side's scan; the two
  * bin-count aggregations shuffle |bins| rows each and join on the bin
  * id. Nothing holds more than the bin table.
  *
  * Determinism: bin shares are ratios of exact counts (identical
  * doubles in any IEEE engine); the single ln per bin is rounded at
  * 6 dp over |bins| rows — the group-granularity rounding argument
  * (BASELINE x2), not the per-row one. Empty bins on either side gate
  * the contribution to NULL (fail-visible, the [[Expectations]]
  * discipline) rather than fabricating a smoothing constant.
  */
object Drift {

  /** Per-bin PSI decomposition of `valueCol` between `reference` and
    * `current`: bin id, both counts, both shares, and the 6-dp-rounded
    * PSI contribution (NULL where a side is empty). The total PSI is
    * the sum over the output — kept per-bin so the drifted REGION is
    * visible, not only the scalar.
    */
  def psiByBin(reference: DataFrame, current: DataFrame, valueCol: String,
      lo: Double, binWidth: Double, nBins: Int): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    def binned(df: DataFrame, out: String): DataFrame = df
      .select(binCol(col(valueCol), lo, binWidth, nBins).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(out))
    val spark = reference.sparkSession
    import spark.implicits._
    // dense bin spine: a bin empty on BOTH sides still reports, with
    // zero counts — an all-zero tail is itself a drift signal
    val spine = (0 until nBins).map(_.toLong).toDF("bin")
    val r = binned(reference, "n_ref")
    val c = binned(current, "n_cur")
    val joined = spine
      .join(r, Seq("bin"), "left").join(c, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    psiColumns(joined)
  }

  /** The PSI tail shared by the value-grid ([[psiByBin]]) and
    * categorical ([[psiByCategory]]) decompositions: shares from exact
    * counts, 6-dp ln contribution, empty-side gates to NULL. The
    * window totals run over the |categories|-row frame, not the data.
    */
  private def psiColumns(joined: DataFrame): DataFrame = {
    val totR = sum(col("n_ref")).over()
    val totC = sum(col("n_cur")).over()
    joined
      .withColumn("p_ref", col("n_ref") / totR)
      .withColumn("p_cur", col("n_cur") / totC)
      .withColumn("psi_contrib",
        when(col("n_ref") > 0 && col("n_cur") > 0,
          round((col("p_ref") - col("p_cur")) * log(col("p_ref") / col("p_cur")), 6)))
      .withColumn("p_ref", round(col("p_ref"), 6))
      .withColumn("p_cur", round(col("p_cur"), 6))
  }

  /** Per-CATEGORY PSI decomposition between `reference` and `current`
    * over an EXPLICIT category spine (the a14 shape with a categorical
    * key instead of a value grid): the spine plays the literal-grid
    * role — a fixed yardstick both sides are scored against, with
    * categories empty on both sides still reporting (an all-zero
    * region is itself a signal). Used by a19 with the fitted IVF cells
    * as the categories: drift in EMBEDDING space shows up as occupancy
    * moving between cells long before any scalar statistic moves.
    * Scale: two |categories|-row count aggregations + spine joins;
    * nothing holds more than the category table.
    */
  def psiByCategory(reference: DataFrame, current: DataFrame,
      catCol: String, spine: DataFrame): DataFrame = {
    def counted(df: DataFrame, out: String): DataFrame =
      df.select(col(catCol)).groupBy(catCol).agg(count(lit(1)).as(out))
    val joined = spine.select(col(catCol))
      .join(counted(reference, "n_ref"), Seq(catCol), "left")
      .join(counted(current, "n_cur"), Seq(catCol), "left")
      .select(col(catCol),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    psiColumns(joined)
  }

  /** The literal-grid bin id for `valueCol` — shared by [[psiByBin]]'s
    * batch sides and the streaming monitor's aggregation key, so the
    * two executions bin identically by construction.
    */
  def binCol(valueCol: Column, lo: Double, binWidth: Double, nBins: Int): Column =
    least(greatest(floor((valueCol - lit(lo)) / lit(binWidth)), lit(0)),
      lit(nBins - 1)).cast("long")

  /** Two-sample Kolmogorov–Smirnov drift over the SAME literal bin
    * grid as [[psiByBin]] — the complementary statistic: PSI weights
    * per-bin share movement (a localized shift dilutes across the
    * log-ratio sum), KS is the max CDF gap (exactly the localized-
    * shift detector, blind to symmetric reshuffles PSI catches). Run
    * both; they disagree on purpose.
    *
    * Integer-exact to the final micro DIV: the per-bin CDF gap is
    * computed in COUNT CROSS PRODUCTS — |cumA·nB − cumB·nA| — never a
    * float fraction, so the statistic AND its argmax bin replay
    * bit-for-bit on any engine/partitioning.
    *   ks_micro = (max gap · 1e6) DIV (nA·nB), ks_bin = lowest bin
    * achieving it. Envelope: cumA·nB ≤ nA·nB must stay under
    * 2^63/1e6 ≈ 9.2e12 ⇒ ~3e6 rows per side balanced — pre-aggregate
    * to bin counts per shard and sum beyond (the counts frame is
    * |bins| rows; only the TOTALS enter the product).
    *
    * Shape at 100 TB: one binned count aggregation per side (map-side
    * partials, |bins| rows out), a |bins|-row spine join, one
    * cumulative window over the bin table — nothing after the scans
    * exceeds the grid, exactly the a14 envelope.
    */
  def ksByBin(a: DataFrame, b: DataFrame, valueCol: String,
      lo: Double, binWidth: Double, nBins: Int): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    def binned(df: DataFrame, out: String): DataFrame = df
      .select(binCol(col(valueCol), lo, binWidth, nBins).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(out))
    val spark = a.sparkSession
    import spark.implicits._
    val spine = (0 until nBins).map(_.toLong).toDF("bin")
    val w = Window.orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(binned(a, "n_a"), Seq("bin"), "left")
      .join(binned(b, "n_b"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .withColumn("cum_a", sum(col("n_a")).over(w))
      .withColumn("cum_b", sum(col("n_b")).over(w))
      .withColumn("tot_a", sum(col("n_a")).over())
      .withColumn("tot_b", sum(col("n_b")).over())
      .withColumn("gap",
        abs(col("cum_a") * col("tot_b") - col("cum_b") * col("tot_a")))
  }

  /** The KS scalar off [[ksByBin]]'s per-bin frame: one row —
    * (n_a, n_b, ks_bin, ks_micro) with the lowest-bin tie-break on
    * the argmax and NULL ks when either side is empty (the
    * [[Expectations]] fail-visible gate, never a fabricated 0).
    */
  def ksStat(perBin: DataFrame): DataFrame =
    perBin.agg(
      max(col("tot_a")).as("n_a"), max(col("tot_b")).as("n_b"),
      max(struct(col("gap"), (-col("bin")).as("nb"))).as("__m"))
      .select(col("n_a"), col("n_b"),
        (-col("__m.nb")).cast("long").as("ks_bin"),
        when(col("n_a") > 0 && col("n_b") > 0,
          expr("(__m.gap * 1000000) DIV (n_a * n_b)"))
          .otherwise(lit(null).cast("long")).as("ks_micro"))

  /** Mann–Whitney rank-sum two-sample test — the EXACT member of the
    * drift-test family ([[psiByBin]] weighs share movement on a grid,
    * [[ksByBin]] the max binned CDF gap; this tests location shift on
    * the raw values, no grid at all): did the new drop's values move
    * up or down against the reference, rank-wise? Per group emits the
    * integer statistic u2_a = 2·U_A (ranks are tie-averaged multiples
    * of ½, so doubling clears the halves — the p72 discipline; their
    * sum is exact in doubles to 2^52), the common-language effect
    * size effect_micro = (u2_a·10⁶) DIV (2·n_a·n_b) — which is
    * exactly the AUC of "is in sample A" against the value — the
    * tie term ΣT = Σ(t³−t), and the tie-corrected normal
    * approximation z (6 dp; the one non-integer site, computed from
    * exactly-representable integer inputs in a fixed operation order
    * so both engines evaluate the identical IEEE expression). Gates:
    * an empty side NULLs everything derived; zero variance (all
    * values tied) NULLs z.
    *
    * Shape at 100 TB: one pooled scan, ONE rank window per group
    * (exactly the p72 AUC envelope — the sort is the cost), one
    * distinct-value tie aggregation with map-side partials, and a
    * |groups|-row join. Envelope: u2_a ≤ 2·n_a·n_b, so the micro lift
    * needs n_a·n_b < 4.6e12 — shard the group key beyond.
    */
  def mannWhitney(a: DataFrame, b: DataFrame, valueCol: String,
      group: String): DataFrame = {
    val pooled = a.select(col(group), col(valueCol).as("__v"), lit(1L).as("__a"))
      .unionByName(
        b.select(col(group), col(valueCol).as("__v"), lit(0L).as("__a")))
    val ranked = graft.stats.Ranks.fractionalRank(
      pooled, Seq(col(group)), col("__v"), "__r")
    val ties = pooled.groupBy(col(group), col("__v"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col(group))
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t")).as("tie_term"))
    val agg = ranked.groupBy(col(group))
      .agg(sum(col("__a")).as("n_a"),
        sum(lit(1L) - col("__a")).as("n_b"),
        round(sum(when(col("__a") === 1L, col("__r") * 2.0).otherwise(0.0)))
          .cast("long").as("__r2a"))
    val nn = (col("n_a") + col("n_b")).cast("double")
    val sig2 = col("n_a").cast("double") * col("n_b").cast("double") / 12.0 *
      (nn + 1.0 - col("tie_term").cast("double") / (nn * (nn - 1.0)))
    agg.join(ties, Seq(group))
      .withColumn("u2_a",
        when(col("n_a") > 0 && col("n_b") > 0,
          col("__r2a") - col("n_a") * (col("n_a") + 1L))
          .otherwise(lit(null).cast("long")))
      .withColumn("effect_micro",
        when(col("n_a") > 0 && col("n_b") > 0,
          expr("(u2_a * 1000000) DIV (2 * n_a * n_b)"))
          .otherwise(lit(null).cast("long")))
      .withColumn("z",
        when(col("n_a") > 0 && col("n_b") > 0 && nn > 1.0 && sig2 > 0.0,
          round((col("u2_a") - col("n_a") * col("n_b")).cast("double") /
            (lit(2.0) * sqrt(sig2)), 6))
          .otherwise(lit(null).cast("double")))
      .select(col(group), col("n_a"), col("n_b"), col("u2_a"),
        col("tie_term"), col("effect_micro"), col("z"))
  }

  /** Reference distribution as (bin, p_ref) over the OBSERVED bins —
    * the broadcastable yardstick a monitor scores incoming windows
    * against. Shares are ratios of exact counts (identical doubles in
    * any IEEE engine).
    */
  def binShares(df: DataFrame, valueCol: String, lo: Double, binWidth: Double,
      nBins: Int): DataFrame =
    df.select(binCol(col(valueCol), lo, binWidth, nBins).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_ref"))
      .withColumn("p_ref", col("n_ref") / sum(col("n_ref")).over())
      .select("bin", "p_ref")

  /** Per-window two-sample KS against a reference COUNT frame — the
    * [[ksByBin]]/[[ksStat]] statistic in the monitor shape
    * [[psiAgainstReference]] gives PSI: `current` is the drained
    * per-(window, bin) count state of a streaming aggregation,
    * `refCounts` the batch-fitted (bin, n_ref) yardstick (counts, not
    * shares — KS's integer cross-product form needs the exact counts).
    * Emits ONE row per window: (windowCol, n_ref, n_cur, ks_bin,
    * ks_micro), lowest-bin argmax tie-break, NULL ks when a side is
    * empty — bit-identical to running [[ksStat]] per window, proven by
    * the x32/a20 twin relationship.
    *
    * Shape: the dense frame is |windows| × nBins rows (monitor-state
    * scale, never data scale); both cumulative windows and the final
    * argmax run over that frame; the reference broadcasts. Envelope:
    * per-window n_ref·n_cur < 9.2e12 (the ksByBin bound).
    */
  def ksAgainstReference(current: DataFrame, refCounts: DataFrame,
      nBins: Int, windowCol: String = "win_start"): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val spark = current.sparkSession
    import spark.implicits._
    val bins = (0 until nBins).map(_.toLong).toDF("bin")
    val spine = current.select(col(windowCol)).distinct()
      .crossJoin(broadcast(bins))
    val w = Window.partitionBy(col(windowCol)).orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(windowCol))
    spine
      .join(current, Seq(windowCol, "bin"), "left")
      .join(broadcast(refCounts), Seq("bin"), "left")
      .select(col(windowCol), col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .withColumn("cum_r", sum(col("n_ref")).over(w))
      .withColumn("cum_c", sum(col("n_cur")).over(w))
      .withColumn("tot_r", sum(col("n_ref")).over(wAll))
      .withColumn("tot_c", sum(col("n_cur")).over(wAll))
      .withColumn("gap",
        abs(col("cum_r") * col("tot_c") - col("cum_c") * col("tot_r")))
      .groupBy(col(windowCol))
      .agg(max(col("tot_r")).as("n_ref"), max(col("tot_c")).as("n_cur"),
        max(struct(col("gap"), (-col("bin")).as("nb"))).as("__m"))
      .select(col(windowCol), col("n_ref"), col("n_cur"),
        (-col("__m.nb")).cast("long").as("ks_bin"),
        when(col("n_ref") > 0 && col("n_cur") > 0,
          expr("(__m.gap * 1000000) DIV (n_ref * n_cur)"))
          .otherwise(lit(null).cast("long")).as("ks_micro"))
  }

  /** Scores per-window bin counts (`windowCol`, `bin`, `n_cur`)
    * against a [[binShares]] reference: per-window shares from a
    * window over the small count frame, reference broadcast, PSI
    * contribution rounded at 6 dp. BOTH asymmetric drift modes gate to
    * NULL instead of vanishing (the [[psiByBin]] fail-visible
    * discipline):
    *
    *  - a bin absent from the reference (novel mass) keeps its
    *    observed row with NULL psi_contrib;
    *  - a reference bin with ZERO current events in a window
    *    (vanished mass — the severe drift mode a plain join would
    *    silently drop) is materialized from a windows × reference-bins
    *    spine with n_cur = 0 and NULL psi_contrib.
    *
    * The spine is |windows| × |reference bins| rows — monitor-state
    * scale, never data scale.
    */
  def psiAgainstReference(current: DataFrame, refShares: DataFrame,
      windowCol: String = "win_start"): DataFrame = {
    val w = Window.partitionBy(col(windowCol))
    val spine = current.select(col(windowCol)).distinct()
      .crossJoin(broadcast(refShares.select(col("bin"))))
    current
      .join(spine, Seq(windowCol, "bin"), "full_outer")
      .withColumn("n_cur", coalesce(col("n_cur"), lit(0L)))
      .withColumn("__tw", sum(col("n_cur")).over(w))
      .join(broadcast(refShares), Seq("bin"), "left")
      .withColumn("p_cur", col("n_cur") / col("__tw"))
      .withColumn("psi_contrib",
        when(col("p_ref").isNotNull && col("n_cur") > 0,
          round((col("p_ref") - col("p_cur")) * log(col("p_ref") / col("p_cur")), 6)))
      .select(col(windowCol), col("bin"), col("n_cur"), col("psi_contrib"))
  }
}
