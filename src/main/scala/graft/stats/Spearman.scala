package graft.stats

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** All-pairs Spearman rank correlation over long-form data.
  *
  * Reference semantics (src/etl_for_all_studies/correlation.py:95-162):
  * for every unordered pair of items (genes) within a family (study),
  * intersect their sample sets, fractional-rank each value vector over
  * the *shared* samples, and compute Pearson correlation of the ranks.
  * Pairs are canonicalized `item_a < item_b`; pairs with fewer than
  * `minSamples` shared samples or a constant value vector are dropped
  * (correlation.py:115-135).
  *
  * Spark shape (SURVEY.md §2.6): equi+theta self-join on (family,
  * sample) with `item_a < item_b` (J5/J6), two fractional-rank windows
  * partitioned by (family, pair), then `corr` aggregate (C1/C2/A4). All
  * built-in operators — ranks and corr are codegen'd, the join and the
  * windows shuffle on their natural keys. Side-b columns are physically
  * renamed before the self-join (no ambiguous self-references).
  *
  * Scale notes: the pair join shuffles on (family, sample) and explodes
  * to P·n rows (P = pairs, n = shared samples) — the inherent size of
  * the per-pair rank computation. The windows and the final aggregate
  * share (family, item_a, item_b) partitioning, so Catalyst plans ONE
  * shuffle for rank+corr. With the reference's whitelist (~120 genes ⇒
  * 7,140 pairs) and 50k samples this is ~3.6e8 rows per study —
  * comfortably distributed. For unfiltered 20k-gene matrices, use
  * [[pairCorrelationsDense]] which ranks once per item (not per pair)
  * so the window work is O(I·n) instead of O(I²·n).
  */
object Spearman {

  private def gatedPairAgg(joined: DataFrame, family: Seq[String], minSamples: Int,
      ra: Column, rb: Column): DataFrame = {
    val pairKeys = family.map(col) ++ Seq(col("item_a"), col("item_b"))
    joined
      .groupBy(pairKeys: _*)
      .agg(
        count(lit(1)).as("n_samples"),
        corr(ra, rb).as("rho"),
        min(col("__va")).as("__mina"), max(col("__va")).as("__maxa"),
        min(col("__vb")).as("__minb"), max(col("__vb")).as("__maxb"))
      .where(col("n_samples") >= minSamples &&
        col("__mina") < col("__maxa") && col("__minb") < col("__maxb") &&
        !isnan(col("rho")) && col("rho").isNotNull)
      .drop("__mina", "__maxa", "__minb", "__maxb")
  }

  /** Self-join of long-form rows on (family, sample) with item_a <
    * item_b; side-b columns arrive renamed so there is no ambiguity.
    * `extraA`/`extraB` name additional (already side-suffixed) columns
    * to carry through.
    */
  private def pairJoin(df: DataFrame, family: Seq[String], item: String,
      sample: String, value: String, rank: Option[String]): DataFrame = {
    val base = Seq(item, sample, value) ++ rank.toSeq
    val aCols = family ++ base
    // Materialize the shared subtree ONCE (eager localCheckpoint), then
    // self-join two aliases over the checkpointed data. Relying on AQE
    // ReuseExchange instead is nondeterministic here: the two join
    // children submit as concurrent stages and race to compute the
    // uncached lineage — measured at sf0.1, the rank-window stage ran
    // TWICE in ~half of runs. The checkpoint pins cost at O(rows)
    // storage — the ranked long-form table, the small side of the
    // pair computation (the join OUTPUT is the P·n blow-up, and that
    // is never materialized). Cluster trade: localCheckpoint truncates
    // lineage into executor-local blocks — an executor lost mid-query
    // fails the job instead of recomputing; swap for df.checkpoint()
    // (reliable storage) on preemptible clusters.
    val pre = df.select(aCols.map(col): _*)
      .repartition((family :+ sample).map(col): _*)
      .localCheckpoint(true)
    val cond = (family.map(k => col(s"a.$k") === col(s"b.$k")) :+
      (col(s"a.$sample") === col(s"b.$sample")) :+
      (col(s"a.$item") < col(s"b.$item"))).reduce(_ && _)
    val aSide = (family :+ sample).map(k => col(s"a.$k")) ++
      (Seq(col(s"a.$item").as("item_a"), col(s"a.$value").as("__va")) ++
        rank.map(r => col(s"a.$r").as("__ra")))
    val bSide = Seq(col(s"b.$item").as("item_b"), col(s"b.$value").as("__vb")) ++
      rank.map(r => col(s"b.$r").as("__rb"))
    pre.as("a").join(pre.as("b"), cond)
      .select(aSide ++ bSide: _*)
      .drop(sample)
  }

  /** Exact per-pair Spearman (ranks over the shared-sample
    * intersection, matching the reference on incomplete matrices).
    *
    * Input: long-form rows (family..., item, sample, value).
    * Output: (family..., item_a, item_b, n_samples, rho) — gated.
    *
    * Plan: pair self-join, then ONE aggregation pass with the
    * [[graft.functions.SpearmanStat]] typed aggregate — the P·n-row
    * join output partial-aggregates map-side into compact per-pair
    * (va, vb) primitive buffers, so the only exchange carries ~16
    * bytes/sample with the pair key stored once per map partition, and
    * ranking happens per-pair at merge completion (two primitive-array
    * sorts + rank binary searches). Replaces the previous two
    * per-pair fractional-rank windows + `corr`, which shuffled and
    * sorted all P·n ranked rows (measured 2×35.7 M-row sorts on the
    * 4-study scale fixture). [[pairCorrelationsWindowed]] keeps that
    * plan for the equality-pinning spec.
    */
  def pairCorrelations(
      df: DataFrame,
      family: Seq[String],
      item: String,
      sample: String,
      value: String,
      minSamples: Int = 2): DataFrame = {
    val joined = pairJoin(df, family, item, sample, value, rank = None)
    val pairKeys = family.map(col) ++ Seq(col("item_a"), col("item_b"))
    joined
      .groupBy(pairKeys: _*)
      .agg(graft.functions.SpearmanStatFn(col("__va"), col("__vb")).as("__s"))
      .select((pairKeys ++ Seq(
        col("__s.n_samples").as("n_samples"), col("__s.rho").as("rho"),
        col("__s.min_a").as("__mina"), col("__s.max_a").as("__maxa"),
        col("__s.min_b").as("__minb"), col("__s.max_b").as("__maxb"))): _*)
      .where(col("n_samples") >= minSamples &&
        col("__mina") < col("__maxa") && col("__minb") < col("__maxb") &&
        !isnan(col("rho")) && col("rho").isNotNull)
      .drop("__mina", "__maxa", "__minb", "__maxb")
  }

  /** The pre-round-3 exact plan (two per-pair rank windows + `corr`
    * over the P·n join output) — retained as the independent
    * formulation that pins [[pairCorrelations]]'s typed-aggregate plan
    * in StatsSpec. Not used by any job path.
    */
  private[graft] def pairCorrelationsWindowed(
      df: DataFrame,
      family: Seq[String],
      item: String,
      sample: String,
      value: String,
      minSamples: Int = 2): DataFrame = {
    val joined = pairJoin(df, family, item, sample, value, rank = None)
    val pairKeys = family.map(col) ++ Seq(col("item_a"), col("item_b"))
    val ranked = Ranks.fractionalRank(
      Ranks.fractionalRank(joined, pairKeys, col("__va"), "__ra"),
      pairKeys, col("__vb"), "__rb")
    gatedPairAgg(ranked, family, minSamples, col("__ra"), col("__rb"))
  }

  /** Scale-path variant for complete matrices (every item observed on
    * every sample of its family — the common genomic case): ranks are
    * computed ONCE per (family, item) instead of once per pair, then
    * the ranked rows pair up through [[pairJoin]]'s self-join — both
    * sides of which are aliases over ONE pre-shuffled subtree, so the
    * scan + rank window + exchange execute once (AQE exchange reuse).
    * Identical output to [[pairCorrelations]] on complete matrices:
    * with nothing missing, ranks over the shared samples equal the
    * global per-item ranks (pinned by StatsSpec).
    *
    * Cost model: O(I·n log n) window work + a P·n-row join output
    * (P = item pairs) feeding the gated aggregate — vs the exact
    * path's O(P·n log n) per-pair rank windows. For incomplete
    * matrices use [[pairCorrelations]], which is the semantics, not
    * just the slower plan.
    */
  def pairCorrelationsDense(
      df: DataFrame,
      family: Seq[String],
      item: String,
      sample: String,
      value: String,
      minSamples: Int = 2,
      knownItems: Option[Seq[Any]] = None,
      wideLimit: Int = WideItemLimit): DataFrame = {
    val itemKeys = family.map(col) :+ col(item)
    val ranked = Ranks.fractionalRank(df, itemKeys, col(value), "__r0")
    // Item inventory: passed by callers that know it, else one tiny
    // driver action on a distinct of one column. Canonicalized
    // (dedup + ascending) regardless of source so the wide path's
    // pair enumeration matches the join path's `item_a < item_b`
    // condition even when a caller passes an unsorted/duplicated list.
    // Item sets of 2..wideLimit take the wide (pivot) plan; the
    // DEFAULT wideLimit is 0 — the join plan measured faster at every
    // shape tried (see WideItemLimit) — so the wide plan is opt-in,
    // for callers that want its stricter uniqueness validation
    // (raise_error on duplicate observations — the join path would
    // cross-product them instead).
    // The probe LIMITs at wideLimit+1: deciding the path only needs
    // "more than the limit?", so a large inventory (the genomic case —
    // hundreds of genes) short-circuits instead of paying a full
    // distinct+sort; at or under the limit, the probe IS the complete
    // inventory and is canonicalized driver-side.
    val items = knownItems.getOrElse(
      df.select(col(item)).distinct().limit(wideLimit + 1)
        .collect().map(_.get(0)).toSeq)
      .distinct.sortWith(sqlLt)
    if (items.length >= 2 && items.length <= wideLimit)
      widePairAgg(ranked, family, item, sample, value, minSamples, items)
    else {
      val joined = pairJoin(ranked, family, item, sample, value, rank = Some("__r0"))
      gatedPairAgg(joined, family, minSamples, col("__ra"), col("__rb"))
    }
  }

  /** SQL-ordering comparator for item inventory values, matching
    * Spark's own ordering so the wide path's item_a/item_b labeling
    * agrees with the join path's `item_a < item_b` condition: strings
    * compare by UTF-8 byte order (UTF8String semantics — UTF-16 char
    * order diverges for supplementary code points), integrals compare
    * as longs (a double round-trip loses precision above 2^53), and
    * only mixed integral/floating pairs take the double route (Spark's
    * implicit widening for such comparisons). Anything else falls back
    * to string order.
    */
  private def sqlLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: String, y: String) =>
      java.util.Arrays.compareUnsigned(
        x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
    case (x: java.lang.Number, y: java.lang.Number) =>
      if (isIntegral(x) && isIntegral(y)) x.longValue < y.longValue
      else x.doubleValue < y.doubleValue
    case _ => String.valueOf(a) < String.valueOf(b)
  }

  private def isIntegral(n: java.lang.Number): Boolean = n match {
    case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
        _: java.lang.Long => true
    case _ => false
  }

  /** Default item-count ceiling for the wide (pivot) plan — 0: the
    * JOIN plan is the measured winner at every shape tried, so the
    * wide plan is opt-in via the `wideLimit` parameter.
    *
    * Round-3 measurements (ProbeWideCrossover on the 4-study × 5,000
    * sample scale fixture; ProbeC2Path on the sf0.1 bench shape):
    *
    *   I      wide      join     (scale fixture, seconds)
    *   3      4.8       1.9
    *   8      9.5       2.3
    *   16     11.3      4.8
    *   32     54.4      2.0
    *   64     668       4.4
    *   120    (hours)   9.6
    *   c2 sf0.1 shape: wide 2.65, join 2.36 (steady state)
    *
    * The wide plan's round-2 3× win at I=3 was measured against the
    * PRE-round-3 join formulation (two per-pair rank windows over the
    * P·n join output); once the join route carried per-item ranks and
    * the exact path became one typed-aggregate pass, the join plan won
    * everywhere. Two structural reasons the wide plan loses at scale:
    * its final aggregate has only |families| groups (parallelism
    * collapses to the family count — 4 single-threaded groups on the
    * fixture), and P(P−1)/2·6 aggregate columns blow past codegen
    * limits (48 MiB task binaries at I=64). Retained as an opt-in
    * because its per-(family,sample) uniqueness guard (raise_error on
    * duplicate observations) is stricter than the join path's, and
    * StatsSpec pins the two plans' equality.
    */
  val WideItemLimit = 0

  /** Wide (pivot-style) dense Spearman: reshape the ranked long form to
    * one row per (family, sample) with a rank and value column per item
    * (conditional-aggregation pivot), then compute EVERY pair's
    * (corr, n, min/max gates) as parallel aggregate columns of ONE
    * groupBy(family), and unpivot the per-pair structs back to rows.
    *
    * Identical semantics to the join path on complete AND incomplete
    * matrices under dense ranking: `corr` ignores rows where either
    * rank is null (= the inner pair join on shared samples), `n` counts
    * both-present rows, and the gates min/max over the both-present
    * subset. The difference is the plan: two shuffles of I·n rows
    * (rank window, sample pivot) + one tiny family aggregate — the
    * P·n-row join blow-up never exists. At I=3/sf0.1 this measured
    * ~3x faster than the self-join plan; at I=120 (7,140 pairs ⇒ ~50k
    * aggregate columns) it would not compile efficiently — the join
    * path takes over above [[WideItemLimit]].
    */
  private def widePairAgg(ranked0: DataFrame, family: Seq[String], item: String,
      sample: String, value: String, minSamples: Int, items: Seq[Any]): DataFrame = {
    val n = items.length
    // Restrict to the canonicalized inventory (and non-null items, which
    // `isin` drops naturally): a knownItems subset or stray NULL item
    // must behave like the join path — those rows simply don't pair —
    // rather than inflate __nobs and trip the duplicate guard below.
    // Ranks are per (family, item) partitions, so dropping whole item
    // groups after ranking leaves the kept items' ranks untouched.
    val ranked = ranked0.where(col(item).isin(items: _*))
    // pivot: one rank + one value column per item (at most one row per
    // (family, sample, item) in a dense matrix — max picks it)
    val pivotAggs = items.zipWithIndex.flatMap { case (it, i) =>
      Seq(max(when(col(item) === lit(it), col("__r0"))).as(s"__r_$i"),
        max(when(col(item) === lit(it), col(value))).as(s"__v_$i"))
    } :+ count(lit(1)).as("__nobs")
    // uniqueness guard: a (family, sample) group must have at most one
    // observation per item; more rows than present items means a
    // duplicate the pivot would silently collapse (the join path would
    // cross-product it) — fail loudly instead
    val present = items.indices
      .map(i => when(col(s"__r_$i").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    // the guard wraps __r_0 (read by every (0, j) pair aggregate) —
    // a free-standing dropped column would be pruned away unevaluated
    val wide = ranked.groupBy((family.map(col) :+ col(sample)): _*)
      .agg(pivotAggs.head, pivotAggs.tail: _*)
      .withColumn("__r_0",
        when(col("__nobs") > present, raise_error(concat(
          lit("Spearman wide path requires unique (family, item, sample) " +
            "observations; duplicate found at sample="), col(sample).cast("string"))))
          .otherwise(col("__r_0")))
      .drop("__nobs")
    val pairs = for { i <- 0 until n; j <- i + 1 until n } yield (i, j)
    val pairAggs = pairs.flatMap { case (i, j) =>
      val (ri, rj) = (col(s"__r_$i"), col(s"__r_$j"))
      val both = ri.isNotNull && rj.isNotNull
      Seq(
        corr(ri, rj).as(s"__rho_${i}_$j"),
        count(when(both, 1)).as(s"__n_${i}_$j"),
        min(when(both, col(s"__v_$i"))).as(s"__mina_${i}_$j"),
        max(when(both, col(s"__v_$i"))).as(s"__maxa_${i}_$j"),
        min(when(both, col(s"__v_$j"))).as(s"__minb_${i}_$j"),
        max(when(both, col(s"__v_$j"))).as(s"__maxb_${i}_$j"))
    }
    val agged = wide.groupBy(family.map(col): _*).agg(pairAggs.head, pairAggs.tail: _*)
    val pairStructs = pairs.map { case (i, j) =>
      struct(lit(items(i)).as("item_a"), lit(items(j)).as("item_b"),
        col(s"__n_${i}_$j").as("n_samples"), col(s"__rho_${i}_$j").as("rho"),
        col(s"__mina_${i}_$j").as("__mina"), col(s"__maxa_${i}_$j").as("__maxa"),
        col(s"__minb_${i}_$j").as("__minb"), col(s"__maxb_${i}_$j").as("__maxb"))
    }
    agged
      .select((family.map(col) :+ explode(array(pairStructs: _*)).as("__pair")): _*)
      .select((family.map(col) :+ col("__pair.*")): _*)
      .where(col("n_samples") >= minSamples &&
        col("__mina") < col("__maxa") && col("__minb") < col("__maxb") &&
        !isnan(col("rho")) && col("rho").isNotNull)
      .drop("__mina", "__maxa", "__minb", "__maxb")
  }
}
