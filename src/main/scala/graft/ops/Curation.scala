package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end curation funnel — the composition every pretraining
  * data pipeline actually runs, assembled from this engine's verified
  * stages so the interop itself is oracle-checked (p30):
  *
  *  1. QUALITY GATE — [[TextStats.withQualityColumns]] score >=
  *     `minQuality`, compared at 6-dp rounding on BOTH engines (the
  *     per-row score is a fixed expression tree, so the raw doubles
  *     already agree bit-for-bit; the rounding is belt-and-braces for
  *     docs sitting exactly on the threshold).
  *  2. NORMALIZED DEDUP — one survivor per normalized-text digest
  *     ([[Dedup.normalizedText]]), minimum id wins.
  *  3. NEAR-DUP DROP — SimHash hamming<=maxHamming pairs among the
  *     stage-2 survivors; the LARGER id of every pair drops. This is
  *     the greedy pairwise rule, deliberately join-local: one
  *     candidate join + one anti-join, no iteration. When transitive
  *     chains matter, route the pairs through
  *     [[ConnectedComponents]] instead and keep component minima.
  *  4. TOKEN BUDGET — per-stratum maximal hash-ordered prefix
  *     ([[Sampling.tokenBudgetSample]]) for mixture control.
  *
  * Scale shape: stages 1-2 are per-row math + one digest-keyed
  * aggregation; stage 3 is the pigeonhole-blocked pair join (bounded
  * fan-out); stage 4 is a per-stratum window. Nothing in the funnel
  * introduces a shuffle the standalone operators don't already have.
  */
object Curation {

  /** Stage 1 body — ONE definition shared with the declarative runner
    * ([[CurationPipeline]]); a second copy of the 6-dp threshold rule
    * could silently drift the two execution paths apart.
    */
  private[ops] def qualityGateStage(df: DataFrame, minQuality: Double,
      text: String, shape: Seq[org.apache.spark.sql.Column]): DataFrame =
    TextStats.withQualityColumns(df, text)
      .where(round(col("quality_score"), 6) >= minQuality)
      .select(shape: _*)

  /** Min-id-per-digest dedup body (stage 2 and the exact variant) —
    * shared for the same one-definition reason.
    */
  private[ops] def dedupStage(df: DataFrame, id: String,
      digest: org.apache.spark.sql.Column): DataFrame = {
    val keep = df.groupBy(digest.as("__digest"))
      .agg(min(col(id)).as(id))
      .select(id)
    df.join(keep, Seq(id), "left_semi")
  }

  /** Greedy near-dup drop body (stage 3) — the larger id of every
    * hamming pair drops; shared for the same one-definition reason.
    */
  private[ops] def nearDupDropStage(df: DataFrame, maxHamming: Int,
      id: String, text: String): DataFrame = {
    val drops = Dedup.simhashPairs(df, maxHamming, id, text)
      .select(col("id_b").as(id)).distinct()
    df.join(drops, Seq(id), "left_anti")
  }

  def curate(docs: DataFrame, minQuality: Double = 0.5, budgetTokens: Long = 800L,
      maxHamming: Int = 3, strata: Seq[String] = Seq("source"),
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val originalShape = docs.columns.map(col).toIndexedSeq

    // 1: quality gate (6-dp comparison, see scaladoc). NOTE the gate is
    // a FILTER, so a round-robin spread ahead of it cannot parallelize
    // the regex: Catalyst pushes deterministic filters below a
    // Repartition, leaving the regex in the scan task anyway (round-15
    // measured the attempted spread as a pure exchange cost, +0.3-1.0 s
    // — reverted). On a single-split toy file the gate is scan-bound by
    // construction; at corpus scale the scan has real splits and the
    // pushed-down filter close to the source is exactly right.
    // Eagerly materialized: the gated frame feeds BOTH sides of the
    // stage-2 dedup (digest groupBy + semi-join back), and without the
    // checkpoint the per-row regex pipeline re-evaluates per branch —
    // the same measured rationale as Dedup.minhashDupPairs' cache (and
    // the same executor-loss recompute trade, documented there).
    val gated = qualityGateStage(docs, minQuality, text, originalShape)
      .localCheckpoint(true)

    // 2: normalized dedup, min id per digest; materialized for the
    // same reason — stage 3 reads it twice (simhash input + anti-join
    // left side)
    val deduped = dedupStage(gated, id, md5(Dedup.normalizedText(col(text))))
      .localCheckpoint(true)

    // 3: greedy near-dup drop
    val survivors = nearDupDropStage(deduped, maxHamming, id, text)

    // 4: per-stratum token budget
    Sampling.tokenBudgetSample(survivors, strata, budgetTokens, id, text)
      .select((col(id) +: strata.map(col) :+ col("n_tokens") :+ col("cum_tokens")): _*)
  }
}
