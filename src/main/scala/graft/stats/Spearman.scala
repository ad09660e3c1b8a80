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
    // Pre-shuffle ONCE on the equi-join keys, then self-join via plan
    // aliases over the SAME subtree: the two sides canonicalize
    // identically, so ReuseExchange computes the shuffle (and the whole
    // upstream lineage — scan, rank window) exactly once, and
    // EnsureRequirements adds no further shuffle because the children
    // already satisfy the join's HashPartitioning. (Side-b columns
    // renamed AFTER the join; dataset-alias `col("a.x")` refs keep the
    // self-join conditions unambiguous.)
    val pre = df.select(aCols.map(col): _*)
      .repartition((family :+ sample).map(col): _*)
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
      minSamples: Int = 2): DataFrame = {
    val itemKeys = family.map(col) :+ col(item)
    // No materialization needed: pairJoin pre-shuffles once on the join
    // keys and both self-join sides reuse that single exchange, so the
    // ranked lineage (scan + rank window) runs exactly once.
    val ranked = Ranks.fractionalRank(df, itemKeys, col(value), "__r0")
    val joined = pairJoin(ranked, family, item, sample, value, rank = Some("__r0"))
    gatedPairAgg(joined, family, minSamples, col("__ra"), col("__rb"))
  }
}
