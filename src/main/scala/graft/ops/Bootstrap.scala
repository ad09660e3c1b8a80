package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Poisson-bootstrap confidence intervals — the ONE-PASS bootstrap
  * that actually works at corpus scale (Chamandy et al., "Estimating
  * Uncertainty for Massive Data Streams", the standard large-data
  * form): classic bootstrap resampling draws n rows WITH replacement
  * B times — undistributable, because a resample is a global object —
  * while the Poisson approximation gives every (row, resample) an
  * independent Poisson(1) replication count, so the whole B-resample
  * ensemble is ONE stateless map over the data followed by one
  * aggregation. No shuffle of data rows, no global sample: state is
  * |groups| × B partial sums, map-side combined.
  *
  * Determinism discipline: the replication count derives from
  * hex64(doc_id, b) through the INTEGER inverse-CDF thresholds below
  * (Poisson(1) CDF on the 1e-6 grid, hard literals — no runtime
  * transcendentals), metric values ride as exact micro-units, resample
  * means use truncating integer division, and the CI bounds are order
  * statistics of 64 integers — every step replays bit-exactly in SQL.
  * Contrast a12/a14's closed-form normal intervals: the bootstrap
  * makes NO distributional assumption about the metric, which is the
  * point — quality scores are lumpy lattice mixtures, not Gaussians.
  *
  * 100 TB: cost is B× the metric scan in flops (64 hash+compare per
  * row), all inside one whole-stage-codegen'd map; the aggregation
  * output is groups × B longs. The intermediate sum Σ w·q_micro stays
  * under Long.Max out to ~1e12 rows per group per resample (w ≤ 9,
  * q_micro ≤ 1e6); shard the group key beyond that.
  */
object Bootstrap {

  /** Poisson(1) CDF quantized to the 1e-6 integer grid: threshold k is
    * round(P(X ≤ k)·1e6); a uniform micro-draw u ∈ [0, 1e6) replicates
    * a row w(u) = #{k: t_k ≤ u} times (capped at 9, CDF ≈ 1 − 1.1e-6).
    * Literal integers on both engines — the cross-engine contract
    * needs no exp/ln at runtime.
    */
  val PoissonCdfMicro: Seq[Long] = Seq(
    367879L, 735759L, 919699L, 981012L, 996340L,
    999406L, 999917L, 999990L, 999999L)

  /** Replication count from a micro-grid uniform draw. */
  def poissonWeight(uMicro: Column): Column =
    PoissonCdfMicro.map(t => when(uMicro >= t, 1L).otherwise(0L))
      .reduce(_ + _)

  /** Nearest-rank order statistics for a central 95% interval over b
    * resample means: ceil(0.025·b) and ceil(0.975·b). At the default
    * b = 64 these are ranks 2 and 63 — the ~1.6% / ~98.4% nearest-rank
    * levels (nearest-rank is conservative-outward on a 64-point grid;
    * exact 2.5/97.5 would need interpolation, which would break the
    * integer-exact oracle replay). Deriving from b keeps the nominal
    * level stable as b changes: b = 128 → ranks 4/125, b = 1000 →
    * 25/975.
    */
  def ciRanks(b: Int): (Int, Int) =
    (math.ceil(0.025 * b).toInt.max(1), math.ceil(0.975 * b).toInt.min(b))

  /** Per-group bootstrap CI of the mean of `metricMicro` (an exact
    * micro-unit long): (group, n_docs, point_mean_micro, ci_lo_micro,
    * ci_hi_micro). The bounds are the `ciRanks(b)` order statistics of
    * the b resample means — at the default b = 64, ranks 2 and 63, the
    * ~1.6% / ~98.4% nearest-rank percentiles (see [[ciRanks]]) — ties
    * broken by resample id, so the interval is a deterministic
    * function of the corpus. Groups too small to populate a bound rank
    * (Poisson(1) resamples of an n-row group are all-empty with
    * probability e^−n each, so tiny groups can yield < b non-empty
    * means) keep their point estimate and carry NULL for the missing
    * bound rather than vanish from the output.
    */
  def meanCi(rows: DataFrame, group: String, metricMicro: Column,
      b: Int = 64, id: String = "doc_id"): DataFrame = {
    require(b >= 4, s"need at least 4 resamples for an interval, got $b")
    val (rnLo, rnHi) = ciRanks(b)
    // single-split trap (see Dedup.shingleRows): the document tables
    // arrive as one input split, and everything heavy here — the
    // metric's regex columns, the ×(b+1) explode, one md5 draw per
    // (row, resample) — would run in that ONE scan task (measured:
    // 8-task a16 plan, single-task stages carrying ~2 s). Spread first.
    val base = rows
      .repartition(rows.sparkSession.sparkContext.defaultParallelism)
      .select(col(id), col(group), metricMicro.as("qm"))
    val u = Hashing.hex64(concat_ws("-",
      col(id).cast("string"), col("b").cast("string"), lit("boot"))) % 1000000L
    // Resample −1 carries w = 1 (the medianCi discipline): the point
    // estimate rides the SAME explode+aggregate pass as the b resample
    // means — sum(1·qm) DIV count == the former separate corpus
    // aggregation, exactly, in integers — so the corpus is scanned
    // ONCE, not twice (the metric columns are regex-heavy).
    val perB = base
      .select(col(group), col("qm"),
        explode(sequence(lit(-1), lit(b - 1))).as("b"), col(id))
      .withColumn("w",
        when(col("b") === -1L, lit(1L)).otherwise(poissonWeight(u)))
      .groupBy(col(group), col("b"))
      .agg(sum(col("w") * col("qm")).as("s"), sum(col("w")).as("n"))
      .where(col("n") > 0)
      .withColumn("mean_micro", expr("s DIV n"))
    // NOT checkpointed, deliberately (unlike medianCi/aucBootstrapCi,
    // whose window-bearing subtrees measured a win): meanCi's ensemble
    // is one explode+aggregate, AQE's exchange reuse dedupes the three
    // consumers' copies at runtime, and the eager-checkpoint variant
    // measured ~0.5 s SLOWER at sf0.1 (1.32 → 1.94 bench min) — the
    // materialization job cost more than the deduped recompute.
    val point = perB.where(col("b") === -1L)
      .select(col(group), col("n").as("n_docs"),
        col("mean_micro").as("point_mean_micro"))
    val means = perB.where(col("b") >= 0L)
    val win = Window.partitionBy(col(group))
      .orderBy(col("mean_micro").asc, col("b").asc)
    val ranked = means.withColumn("rn", row_number().over(win))
    point
      .join(ranked.where(col("rn") === rnLo)
        .select(col(group), col("mean_micro").as("ci_lo_micro")),
        Seq(group), "left")
      .join(ranked.where(col("rn") === rnHi)
        .select(col(group), col("mean_micro").as("ci_hi_micro")),
        Seq(group), "left")
  }

  /** Per-group bootstrap CI of the MEDIAN of `metricMicro` — the
    * robust-center counterpart of [[meanCi]]: quality scores are
    * lumpy lattice mixtures where a handful of outliers move the mean
    * but not the median, and the median's sampling distribution has
    * no clean closed form — exactly the case the bootstrap exists
    * for. The resampled median is computed WITHOUT any per-resample
    * sort of data rows (the p75 distinct-value discipline): group by
    * (group, resample, distinct micro value) with map-side partials,
    * one cumulative-weight window over that bounded frame, and the
    * weighted nearest-rank lower median is min(value) where
    * cumweight ≥ (W+1) DIV 2 — all integer arithmetic, so the oracle
    * replays every ensemble bit-exactly. Resample −1 carries w = 1
    * (the corpus median rides the same plan); bounds are the
    * [[ciRanks]] order statistics with the NULL-bounds convention of
    * [[meanCi]].
    *
    * 100 TB: the explode costs (b+1)× the scan; post-aggregation
    * state is groups × (b+1) × distinct micro values (grid-bounded
    * ≤ 1e6+1) — the window never sees the corpus.
    */
  def medianCi(rows: DataFrame, group: String, metricMicro: Column,
      b: Int = 64, id: String = "doc_id"): DataFrame = {
    require(b >= 4, s"need at least 4 resamples for an interval, got $b")
    val (rnLo, rnHi) = ciRanks(b)
    // single-split trap — same rationale as meanCi
    val base = rows
      .repartition(rows.sparkSession.sparkContext.defaultParallelism)
      .select(col(id), col(group), metricMicro.as("qm"))
    val u = Hashing.hex64(concat_ws("-",
      col(id).cast("string"), col("b").cast("string"), lit("boot"))) % 1000000L
    val rep = base
      .select(col(group), col("qm"),
        explode(sequence(lit(-1), lit(b - 1))).as("b"), col(id))
      .withColumn("w",
        when(col("b") === -1L, lit(1L)).otherwise(poissonWeight(u)))
    val byVal = rep.groupBy(col(group), col("b"), col("qm"))
      .agg(sum(col("w")).as("sw"))
    val wCum = Window.partitionBy(col(group), col("b"))
      .orderBy(col("qm").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // tw (the resample's total weight) as a full-partition window over
    // the SAME (group, b) partitioning as the cumulative sum: one
    // shuffle + one window pass replaces the former separate
    // aggregate + self-join of byVal, which executed the whole
    // explode+aggregate lineage twice. Identical integers: tw is the
    // partition's sum(sw) either way, and the tw > 0 gate drops the
    // same all-zero-weight resamples the old inner join dropped.
    val wAll = Window.partitionBy(col(group), col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = byVal.withColumn("cum", sum(col("sw")).over(wCum))
      .withColumn("tw", sum(col("sw")).over(wAll))
    val med = cum
      .where(col("tw") > 0 && col("cum") >= expr("(tw + 1) DIV 2")) // integer division
      .groupBy(col(group), col("b"))
      // tw is constant within (group, b); for b = −1 every row weighs
      // exactly 1, so tw IS the group's row count — the former separate
      // nDocs corpus aggregation, for free off the same pass.
      .agg(min(col("qm")).as("med"), max(col("tw")).as("__tw"))
      // groups × (b+2) rows feeding three consumers (point, lo, hi) —
      // materialized eagerly for the meanCi rationale (the plan audit
      // measured the full corpus subtree executing 3×).
      .localCheckpoint(true)
    val point = med.where(col("b") === -1L)
      .select(col(group), col("med").as("median_micro"),
        col("__tw").as("n_docs"))
    val wr = Window.partitionBy(col(group))
      .orderBy(col("med").asc, col("b").asc)
    val ranked = med.where(col("b") >= 0L)
      .withColumn("rn", row_number().over(wr))
    point
      .select(col(group), col("n_docs"), col("median_micro"))
      .join(ranked.where(col("rn") === rnLo)
        .select(col(group), col("med").as("ci_lo_micro")), Seq(group), "left")
      .join(ranked.where(col("rn") === rnHi)
        .select(col(group), col("med").as("ci_hi_micro")), Seq(group), "left")
  }

  /** The shipped composition: per-source bootstrap CI of mean document
    * quality (the p8 score on the exact micro grid).
    */
  def qualityCi(docs: DataFrame, b: Int = 64, group: String = "source",
      text: String = "text", id: String = "doc_id"): DataFrame =
    meanCi(TextStats.withQualityColumns(docs, text), group,
      round(col("quality_score") * 1e6).cast("long"), b, id)

  /** [[medianCi]] over the p8 quality score — a16's robust twin. */
  def qualityMedianCi(docs: DataFrame, b: Int = 64, group: String = "source",
      text: String = "text", id: String = "doc_id"): DataFrame =
    medianCi(TextStats.withQualityColumns(docs, text), group,
      round(col("quality_score") * 1e6).cast("long"), b, id)
}
