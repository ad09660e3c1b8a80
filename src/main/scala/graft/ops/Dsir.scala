package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** DSIR-style importance-weighted data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every document by the log importance ratio of a TARGET
  * (reference) word distribution to the RAW corpus distribution over
  * hashed features, and keep documents that look more target-like
  * than raw. The published method resamples with Gumbel noise; the
  * deterministic analog keeps the positive-log-ratio set — swap the
  * threshold for a TakeOrdered top-k (the p56 cut) when a fixed token
  * budget matters.
  *
  * Everything is bounded and exact:
  *   - features hash into `buckets` cells via the engine's
  *     DuckDB-replayable md5 hash ([[Hashing.hex64]]);
  *   - BOTH distributions come from ONE corpus pass (the target is a
  *     predicate over the same rows): a map-side-combined aggregation
  *     to ≤ `buckets` rows, collected driver-side — the k-means
  *     centroid-collect discipline;
  *   - per-bucket scores are differences of integer micro-logs with
  *     Laplace +1 smoothing (finite everywhere), so per-document
  *     totals are EXACT integer sums — aggregation order cannot
  *     change a score on any engine.
  *
  * At 100 TB: one corpus aggregation pass to fit, then scoring is a
  * MAP-ONLY column fold over a `buckets`-long literal score array
  * inside whole-stage codegen — no UDF, no join, no shuffle.
  */
object Dsir {

  private def tokensOf(text: String): Column =
    filter(split(trim(lower(col(text))), "\\s+"), t => t =!= "")

  /** Fit the per-bucket log importance ratios: index b holds
    * microLog(target_b + 1, T + B) − microLog(raw_b + 1, R + B).
    * One pass over `docs`; `isTarget` marks the reference slice.
    */
  def bucketScores(docs: DataFrame, isTarget: Column, buckets: Int,
      text: String = "text"): Array[Long] = {
    val (counts, tTot, rTot) = bucketCounts(docs, isTarget, buckets, text)
    Array.tabulate(buckets) { b =>
      val (t, r) = counts.getOrElse(b, (0L, 0L))
      UnigramLm.microLog(t + 1, tTot) - UnigramLm.microLog(r + 1, rTot)
    }
  }

  /** The one corpus pass behind [[bucketScores]], exposed within the
    * package so the grid-boundary audit (GridBoundarySpec) can replay
    * the EXACT micro-log rounding sites — same counts, same
    * smoothing — without duplicating the tokenization.
    */
  private[ops] def bucketCounts(docs: DataFrame, isTarget: Column,
      buckets: Int, text: String): (Map[Int, (Long, Long)], Long, Long) = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val counts = docs
      .select(isTarget.as("__t"), explode(tokensOf(text)).as("__tk"))
      .groupBy((Hashing.hex64(col("__tk")) % buckets).as("bucket"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("tcnt"),
        count(lit(1)).as("rcnt"))
      .collect()
      .map(r => (r.getLong(0).toInt, (r.getLong(1), r.getLong(2)))).toMap
    val tTot = counts.valuesIterator.map(_._1).sum + buckets
    val rTot = counts.valuesIterator.map(_._2).sum + buckets
    (counts, tTot, rTot)
  }

  /** Score documents under fitted bucket scores: (doc_id, n_feat,
    * dsir_micro, keep = dsir_micro > 0). Pure codegen column math —
    * the score array rides the plan as a literal, so the same call
    * scores a batch table or a stream's micro-batches (`carry` rides
    * a cohort key through for monitors).
    */
  def scoreDocs(docs: DataFrame, scores: Array[Long],
      text: String = "text", carry: Seq[String] = Nil,
      id: String = "doc_id"): DataFrame = {
    require(scores.nonEmpty, "scores must be non-empty")
    val b = scores.length
    val sArr = array(scores.map(lit): _*)
    val tk = tokensOf(text)
    docs.select(col(id) +: carry.map(col) :+
        size(tk).cast("long").as("n_feat") :+
        aggregate(
          transform(tk, t =>
            element_at(sArr, (Hashing.hex64(t) % b).cast("int") + 1)),
          lit(0L), (acc, x) => acc + x).as("dsir_micro"): _*)
      .withColumn("keep", col("dsir_micro") > 0)
  }

  /** End-to-end: fit the importance ratios on the `isTarget` slice vs
    * the whole corpus, then score every document.
    */
  def selectByImportance(docs: DataFrame, isTarget: Column,
      buckets: Int = 256, text: String = "text",
      id: String = "doc_id"): DataFrame =
    scoreDocs(docs, bucketScores(docs, isTarget, buckets, text), text, id = id)
}
