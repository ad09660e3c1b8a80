package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling for training-data pipelines.
  *
  * Spark's own `df.sample` is seed-dependent per partition SPLIT — the
  * same row can fall in or out when the file layout changes, which
  * makes corpus snapshots unreproducible. Hashing a stable key instead
  * gives samples that are (a) reproducible across runs, layouts and
  * engines, (b) consistent under incremental appends (a doc's
  * membership never flips), and (c) cheap: the Bernoulli variant is
  * pure per-row column math inside whole-stage codegen — no shuffle at
  * any scale.
  *
  * The hash is the engine's md5-derived 60-bit key
  * ([[graft.ops.Hashing.hex64]], a codegen expression), so the DuckDB
  * oracle can reproduce membership bit-for-bit.
  */
object Sampling {

  private def hashKey(key: Column): Column = Hashing.hex64(key.cast("string"))

  /** Deterministic Bernoulli sample: keeps rows whose key hashes into
    * the lowest `pct` of 100 buckets. Membership depends only on the
    * key value. Map-side only — scales to any size.
    */
  def bernoulliByHash(df: DataFrame, key: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    // hex64 is 60-bit non-negative, so % and pmod agree
    df.where(hashKey(key) % 100 < pct)
  }

  /** Deterministic stratified sample: exactly `k` rows per stratum
    * (fewer when the stratum is smaller), chosen by hash order of the
    * key — stable across runs and engines, no RNG.
    *
    * One shuffle on the strata keys; per-stratum work is a top-k sort.
    * For heavily skewed strata at extreme scale, pre-filter with
    * [[bernoulliByHash]] at a rate that overshoots k, then rank — the
    * window then sorts a bounded candidate set instead of the stratum.
    */
  def stratifiedTopK(df: DataFrame, strata: Seq[String], key: Column,
      k: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashKey(key).asc, key.asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-group document cap, the RefinedWeb/C4 "per-domain cap"
    * curation stage: keep the `k` BEST rows of each stratum by
    * `score` (descending — higher is better; `tiebreak` ascending
    * makes the cut deterministic on exact ties), annotated with their
    * 1-based `cap_rank`. Where [[stratifiedTopK]] samples uniformly by
    * hash, this keeps the quality head of every group — the stage that
    * stops one over-represented domain from dominating a training mix
    * while still surrendering its best documents.
    *
    * One shuffle on the strata keys; the window partitions on the
    * strata so every group ranks in parallel — never a corpus-global
    * sort. For a pathologically hot stratum at extreme scale,
    * pre-thin with [[bernoulliByHash]] at a rate that overshoots `k`
    * (the [[stratifiedTopK]] discipline): the window then ranks a
    * bounded candidate set.
    */
  def capPerGroup(df: DataFrame, strata: Seq[String], score: Column,
      tiebreak: Column, k: Int, rankCol: String = "cap_rank"): DataFrame = {
    require(strata.nonEmpty, "strata must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(score.desc, tiebreak.asc)
    df.withColumn(rankCol, row_number().over(w))
      .where(col(rankCol) <= k)
  }

  /** Deterministic split assignment — train/val/test labeling over the
    * SAME 100-bucket hash space as [[bernoulliByHash]]: `splits` lists
    * (name, pct) in order, pcts summing to 100, and a row whose bucket
    * falls in the i-th cumulative range gets the i-th name. Membership
    * depends only on the key, so splits are stable across runs,
    * layouts, appends AND consistent with bernoulliByHash — a pct-p
    * Bernoulli sample of the corpus is exactly a prefix of the same
    * buckets, so sampled dev corpora inherit the production split.
    *
    * Map-only column math inside codegen — no shuffle at any scale; at
    * 100 TB this is a free column on the existing scan.
    */
  def splitAssign(df: DataFrame, key: Column, splits: Seq[(String, Int)],
      out: String = "split"): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 > 0), s"every split pct must be > 0, got $splits")
    require(splits.map(_._2).sum == 100,
      s"split pcts must sum to 100, got ${splits.map(_._2).sum}")
    val bucket = hashKey(key) % 100
    val cuts = splits.map(_._1).zip(splits.scanLeft(0)(_ + _._2).tail)
    // ascending cut ladder: first matching WHEN wins, last split is the
    // ELSE (bucket < 100 always)
    val assign = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, cut), rest) => when(bucket < cut, lit(name)).otherwise(rest)
    }
    df.withColumn(out, assign)
  }

  /** Family-atomic split assignment — the REMEDIATION the p79 leakage
    * audit names: per-document hash splits put near-duplicate twins on
    * opposite sides of the train/test boundary, silently inflating
    * every benchmark trained on the split. Here the split key is the
    * near-dup FAMILY: `components` is the (id, component) frame from
    * [[ConnectedComponents]] over the dup-pair graph (p22), whose
    * component label is the family's min doc id under min-label
    * propagation; documents absent from the graph are singleton
    * families keyed by their own id. One hash bucket per family ⇒ a
    * detected near-dup pair CANNOT straddle splits — leakage over the
    * audited pair relation is zero by construction, not by luck
    * (SamplingSpec pins the family-atomicity invariant; the p81 query
    * measures the before/after counts on the corpus).
    *
    * Scale: `components` is dup-family-bounded (it only names docs
    * that appear in some pair), far smaller than the corpus; the
    * attach is ONE left equi-join on the id, and the split itself
    * stays [[splitAssign]]'s map-only hash ladder on the family key.
    * Split proportions now hold over FAMILIES rather than documents —
    * the audit-approved trade (a family is one unit of knowledge; its
    * size-weighted document share converges to the pcts as families
    * stay small relative to the corpus).
    */
  def splitAssignByComponent(docs: DataFrame, components: DataFrame,
      splits: Seq[(String, Int)], id: String = "doc_id",
      out: String = "split"): DataFrame = {
    val comp = components.select(col("id").as(id),
      col("component").as("__fam_comp"))
    docs.join(comp, Seq(id), "left")
      .withColumn("family", coalesce(col("__fam_comp"), col(id)))
      .drop("__fam_comp")
      .transform(splitAssign(_, col("family"), splits, out))
  }

  /** Deterministic reshard — the global-shuffle step of a training
    * pipeline: every row gets a `shard` in [0, nShards) by key hash and
    * a dense `pos` (1-based) inside its shard, ordered by (hash, key).
    * Reading shards in pos order IS the reproducible training order —
    * no RNG, no seed file, identical across engines and re-runs, and a
    * re-ingested corpus reshards identically.
    *
    * One shuffle on `shard`; the per-shard sort runs parallel across
    * shards (never a corpus-global ORDER BY — at 100 TB a global sort
    * serializes range boundaries through one exchange; hash sharding
    * needs none). Pick nShards >> executors so AQE can balance.
    */
  def shardByHash(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val h = hashKey(key)
    val w = Window.partitionBy(col("shard")).orderBy(h.asc, key.asc)
    df.withColumn("shard", (h % nShards).cast("int"))
      .withColumn("pos", row_number().over(w))
  }

  /** Deterministic WEIGHTED sampling without replacement (Efraimidis–
    * Spirakis A-ES): each row draws a uniform u in (0,1] from the hash
    * of its key and ranks by ln(u)/w — the top-k per stratum is then
    * distributed exactly as sequential weighted draws without
    * replacement, so higher-quality (heavier) documents are
    * proportionally more likely to survive a corpus cut, while the
    * hash keeps the draw reproducible across runs, layouts, appends
    * and engines (the same no-RNG contract as every sampler here).
    *
    * Ranking by ln(u)/w descending is the monotone-equivalent of the
    * textbook u^(1/w) key (both engines would lose u^(1/w) to double
    * underflow at large w: u^(1/3000) needs ~2^-60 precision near 1).
    * The RANKING runs on the raw double — hash-drawn keys are spread
    * over a ~40-wide range, so adjacent keys sit ~1e-4 apart and a
    * last-ulp `ln` divergence between this engine's libm and the
    * oracle's cannot flip a rank; ranking on a ROUNDED key would
    * instead manufacture ties and break the u^(1/w) distribution's
    * scale invariance (uniformly scaling weights must not move the
    * sample — it's the relative-weight mixture knob). The emitted
    * `sample_key` column is rounded to 6 dp purely so the output
    * hashes stably (the [[Similarity]] k-means quantization argument,
    * applied to the payload instead of the ordering).
    *
    * One shuffle on the strata keys; per-stratum top-k window. At
    * 100 TB: same shape as [[stratifiedTopK]] — and the same overshoot
    * trick applies (pre-gate with a cheap key bound, then rank).
    */
  /** Effective sample size of a weighting scheme per stratum — the
    * standard importance-sampling diagnostic (Kish's ESS =
    * (Σw)² / Σw²): how many EQUALLY-weighted rows the weighted set is
    * worth. A weighting where a handful of heavy rows dominate
    * (ESS ≪ n) warns that any estimate computed under those weights —
    * a [[weightedTopK]] draw, a DSIR-weighted mixture — rides on few
    * effective documents. Emits (strata, n_rows, sum_w, ess; ess
    * rounded to 6 dp, NULL when no positive weight mass).
    *
    * Determinism: Σw and Σw² are EXACT integer sums (map-side
    * combined, one aggregation — no shuffle beyond the group-by);
    * the single float site is the final (Σw)²/Σw² division, computed
    * on exactly-representable longs (p72's one-float-site
    * discipline). Envelope: exactness needs Σw < 2^26·√(Σw²)… in
    * practice Σw ≤ 9e7 keeps (Σw)² inside the 2^53 double mantissa
    * and Σw² ≤ 2^63 is corpus-scale for bounded weights; GUARDED loud
    * (raise_error, round 12 — the documented-envelope convention)
    * instead of silently losing mantissa ulps; shard the stratum key
    * past that. Weights must be ≥ 0 (per-row raise_error, round 13):
    * negative mass makes the diagnostic meaningless AND would bypass
    * the one-sided envelope guard.
    */
  def effectiveSampleSize(df: DataFrame, strata: Seq[String],
      weight: Column): DataFrame = {
    require(strata.nonEmpty, "strata must be non-empty")
    // fail-loud weight domain (the weightedTopK convention): Kish's ESS
    // is undefined for negative mass, and a negative sum_w would also
    // slip past a one-sided envelope guard while still losing mantissa
    // ulps in (Σw)² beyond -9e7. NULL stays NULL (sum skips it, the
    // SQL convention this operator has always had).
    val w0 = weight.cast("long")
    val w = when(w0 < 0L,
      raise_error(concat(lit("effectiveSampleSize: weight must be >= 0, got "),
        w0.cast("string"))).cast("long"))
      .otherwise(w0)
    val guardedSw = when(col("sum_w") > 90000000L,
      raise_error(concat(
        lit("effectiveSampleSize: stratum weight mass "),
        col("sum_w").cast("string"),
        lit(" exceeds the exact one-division envelope (9e7) — shard the stratum key")))
        .cast("long"))
      .otherwise(col("sum_w"))
    df.groupBy(strata.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(w).as("sum_w"), sum(w * w).as("__sw2"))
      .select(strata.map(col) :+ col("n_rows") :+ col("sum_w") :+
        when(col("__sw2") > 0,
          round(guardedSw.cast("double") * col("sum_w").cast("double") /
            col("__sw2").cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("ess"): _*)
  }

  def weightedTopK(df: DataFrame, strata: Seq[String], weight: Column,
      k: Int, key: Column, out: String = "sample_key"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(strata.nonEmpty, "strata must be non-empty")
    // hex64 is uniform on [0, 2^60): (h + 1) / 2^60 lands in (0, 1] so
    // ln(u) is always defined; the long→double cast rounds identically
    // (IEEE nearest) in both engines
    val u = (hashKey(key) + 1).cast("double") / lit(1152921504606846976.0)
    // fail-loud weight domain: ln(u) < 0 divided by a NEGATIVE weight
    // turns positive and deterministically outranks every legitimate
    // row (a corrupt weight would always win the draw); zero yields
    // -Infinity and silently always loses. Neither is a draw.
    val w0 = weight.cast("double")
    val guarded = when(w0.isNull || w0 <= 0.0,
      raise_error(concat(lit("weightedTopK: weight must be > 0, got "),
        coalesce(w0.cast("string"), lit("null")))).cast("double"))
      .otherwise(w0)
    val sampleKey = log(u) / guarded
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(col("__wkey").desc, key.asc)
    df.withColumn("__wkey", sampleKey)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .withColumn(out, round(col("__wkey"), 6))
      .drop("__rn", "__wkey")
  }

  /** Mixture calibration — the target-COMPOSITION half of data mixing
    * (the DoReMi/pile-construction shape; [[tokenBudgetSample]] is the
    * fixed-budget half): given target percentage shares per source,
    * derive the per-source keep rates that realize the LARGEST corpus
    * achievable at exactly that composition (the binding source keeps
    * everything, the over-represented ones downsample), and verdict
    * every document through the family's deterministic hash-Bernoulli
    * at basis-point granularity.
    *
    * All rate math is INTEGER (floor divisions over exact counts), so
    * any engine derives bit-identical rates; membership uses the same
    * hex64 key recipe as [[bernoulliByHash]]/[[splitAssign]] (stable
    * across runs, layouts, and appends — though the 10000-bucket space
    * does NOT nest with the samplers' 100-bucket space: h%100 and
    * h%10000 order keys differently). Sources outside `targets` rate
    * 0 — fail-closed: an unlisted source never leaks into the mixture.
    * A TARGET source absent from the data makes the largest achievable
    * corpus empty — every rate derives to 0 and nothing keeps, which
    * is the mathematically consistent (and very visible) answer rather
    * than a silent re-normalization over the sources that do exist.
    *
    * Scale: one count aggregate, rate derivation as a plan over the
    * (dim-bounded) counts frame — the source vocabulary never touches
    * the driver — rates broadcast back, per-row verdict in codegen.
    * No shuffle of the data.
    */
  def calibrateMixture(df: DataFrame, targets: Seq[(String, Int)],
      key: Column, source: String = "source"): DataFrame = {
    val counts = df.groupBy(col(source))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__grp", lit(0))
    val rates = mixtureRatesPerGroup(counts, targets, Seq("__grp"),
        source, "__n")
      .select(col(source), col("rate_bps"))
    df.join(broadcast(rates), Seq(source), "left")
      .withColumn("rate_bps", coalesce(col("rate_bps"), lit(0L)))
      .withColumn("keep", hashKey(key) % 10000 < col("rate_bps"))
  }

  /** The rate-derivation core of [[calibrateMixture]], per GROUP: from
    * a counts frame (`groupCols`, `source`, `n`), derive each group's
    * integer keep rates realizing the target composition independently
    * within that group. This is the shared definition behind the batch
    * calibrator (one constant group) and the streaming per-window
    * rebalancer (group = event-time window) — the x23/p37 shared-rule
    * discipline applied to mixture math: the two executions CANNOT
    * drift because there is only one derivation.
    *
    * Output: the full groups × targets grid (`groupCols`, `source`,
    * `n_docs` — 0 for a target source absent from a group — and
    * `rate_bps`). Count-frame sources outside `targets` are dropped;
    * a target source missing from a group zeroes that group's whole
    * mixture (see [[calibrateMixture]]'s fail-closed contract).
    *
    * All divisions are Spark's `div` (exact long division, truncating
    * — equal to floor on these non-negative operands), never `/`
    * (double): counts at corpus scale exceed the 2^53 double lattice,
    * and the engine-bit-identical contract only survives in integers.
    *
    * Shape: ONE aggregation over the counts frame (per group: a
    * source→count map of the target sources, the min capped total,
    * and a presence count), then the target list explodes back out of
    * a literal array — no join anywhere in the derivation, so it can
    * never plan a nested-loop or shuffle a row twice. `counts` must
    * be unique per (group, source): a duplicate key fails the map
    * build loudly rather than silently summing.
    *
    * Scale: the one shuffle carries |groups|·|sources| count rows
    * (dim-bounded); per-group state is a ≤|sources|-entry map.
    * Nothing here ever sees a document row.
    */
  def mixtureRatesPerGroup(counts: DataFrame, targets: Seq[(String, Int)],
      groupCols: Seq[String], source: String = "source",
      n: String = "n"): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.forall(_._2 > 0), s"target shares must be positive: $targets")
    require(targets.map(_._2).sum == 100,
      s"target shares must sum to 100, got ${targets.map(_._2).sum}")
    require(targets.map(_._1).distinct.length == targets.length,
      s"duplicate target sources: $targets")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    // target share as a literal lookup — the targets are part of the
    // QUERY, not data, so they never need a join
    val tpct = targets.foldLeft(lit(null).cast("long")) {
      case (acc, (s0, t0)) =>
        when(col(source) === lit(s0), lit(t0.toLong)).otherwise(acc)
    }
    val perGroup = counts
      .withColumn("__tpct", tpct)
      .withColumn("__nl", col(n).cast("long"))
      // per-source cap: t% of the group total must fit in this count
      .withColumn("__cap", expr("(__nl * 100) div __tpct"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        // non-target sources drop out here (when(...) -> null rows
        // are skipped by collect_list): the map holds target counts
        map_from_entries(collect_list(
          when(col("__tpct").isNotNull, struct(col(source), col("__nl")))))
          .as("__nmap"),
        min(col("__cap")).as("__mincap"),
        sum(when(col("__tpct").isNotNull, 1L).otherwise(0L)).as("__npresent"))
      // T_g: a target source absent from the group bounds it at 0
      // (fail-closed); otherwise the tightest per-source cap
      .withColumn("__total",
        when(col("__npresent") < lit(targets.length.toLong), lit(0L))
          .otherwise(coalesce(col("__mincap"), lit(0L))))
    val tgArr = array(targets.map { case (s0, t0) =>
      struct(lit(s0).as("s"), lit(t0.toLong).as("t")) }: _*)
    perGroup
      .withColumn("__t", explode(tgArr))
      .withColumn("__n0",
        coalesce(element_at(col("__nmap"), col("__t")("s")), lit(0L)))
      .withColumn("__tp", col("__t")("t"))
      .withColumn("rate_bps",
        when(col("__n0") === 0L, 0L)
          .otherwise(expr("((__tp * __total) div 100) * 10000 div __n0")))
      .select((groupCols.map(col) :+ col("__t")("s").as(source) :+
        col("__n0").as("n_docs") :+ col("rate_bps")): _*)
  }

  /** Token-budgeted per-stratum sampling — the data-MIXING step of a
    * pretraining pipeline: each stratum (source, language, ...)
    * contributes the largest hash-ordered PREFIX of its documents
    * whose cumulative token count fits `budgetTokens`. Hash order
    * makes the prefix a deterministic pseudo-random draw (stable
    * across runs/layouts/appends, like every sampler here); the prefix
    * property means a document's membership only depends on the
    * stratum's smaller-hash documents, so growing the budget only ADDS
    * documents — mixture ratios can be tuned monotonically.
    *
    * One shuffle on the strata keys; the cumulative sum is a per-
    * stratum window (never corpus-global — same layout argument as
    * [[TextStats.packSequences]]). Output adds n_tokens and the
    * running cum_tokens (<= budget by construction).
    */
  def tokenBudgetSample(df: DataFrame, strata: Seq[String], budgetTokens: Long,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    require(strata.nonEmpty,
      "strata must be non-empty — an unpartitioned running sum would " +
        "serialize the whole corpus into one task (shard by source/lang/hash bucket)")
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashKey(col(id)).asc, col(id).asc)
    df.withColumn("n_tokens", TextStats.tokenCountWs(col(text)).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // cumsum is monotone within the stratum, so this keeps exactly
      // the maximal prefix that fits
      .where(col("cum_tokens") <= budgetTokens)
  }
}
