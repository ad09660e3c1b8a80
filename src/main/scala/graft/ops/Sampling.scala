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
