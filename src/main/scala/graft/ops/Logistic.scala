package graft.ops

import graft.functions.AsciiLowerFn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Trained linear quality classifier — the DCLM/fastText stage that
  * p43's frozen scorer stubs: logistic regression fit by full-batch
  * gradient descent, where each GD round is ONE aggregation over the
  * feature frame and the model state is four driver-side longs (the
  * k-means/Lloyd-loop discipline: bounded driver state, per-round cost
  * one map-side-combined pass, rounds sequential by construction).
  *
  * Everything is deterministic and cross-engine exact:
  *   - features live on an integer lattice (token count capped at 50,
  *     punctuation/stopword ratios floored to percent points) divided
  *     by fixed power-like scales — identical doubles on any engine;
  *   - labels are the engine's own p8 quality rule at the p30
  *     threshold (distilling the heuristic into a linear model — swap
  *     in human labels and nothing else changes);
  *   - per-row gradient contributions quantize to integer micro-units
  *     (round(g·1e6) as BIGINT) and SUM EXACTLY — aggregation order
  *     cannot change the result, so training is bit-identical across
  *     partitionings and engines;
  *   - the weight update is truncating integer division
  *     ((lrNum·G)/n in micro-units, JVM long semantics) — replayed
  *     exactly by DuckDB's truncating BIGINT `//`.
  * The one accepted cross-engine hazard is libm-vs-JDK `exp` ulp noise
  * BEFORE the per-row quantization — the same ~1e-10-per-rounding
  * coincidence budget as every micro-log query (BASELINE.md).
  *
  * At 100 TB: the feature frame (5 doubles per doc) is checkpointed
  * once off the corpus scan; R gradient passes read features, never
  * text; the driver holds 4 longs. Scoring is pure broadcast column
  * math on the same frame.
  */
object Logistic {

  /** Feature scales: bias, token-count cap, percent lattices. */
  private val TokenCap = 50L

  /** Label + integer-lattice features for every document:
    * y ∈ {0,1} (p8 quality ≥ 0.78, the p30 threshold), x0 bias,
    * x1 capped token count / 50, x2 punct percent / 100,
    * x3 stopword percent / 100. `carry` columns (a cohort key for a
    * monitor) ride through unchanged — pure column math, so the frame
    * works identically on a batch table or a stream.
    */
  def features(docs: DataFrame, text: String = "text",
      carry: Seq[String] = Nil): DataFrame =
    featureBase(docs, text)
      .select(col("doc_id") +: carry.map(col) :+ col("y") :+
        col("x0") :+ col("x1") :+ col("x2") :+ col("x3"): _*)

  /** A SECOND feature supplier through the SAME train/score path —
    * the pluggability contract made concrete: [[features]]' four
    * dimensions plus x4 capped char length / 2000 and x5 capped
    * integer mean word length / 20 (floor(n_chars/n_tokens), the
    * same percent-lattice exactness discipline). [[train]] and
    * [[scoreWith]] read the frame's x-arity, so nothing else changes
    * — a caller's own (doc_id, y, x0..x{n-1}) frame is equally
    * first-class.
    */
  def featuresExtended(docs: DataFrame, text: String = "text",
      carry: Seq[String] = Nil): DataFrame =
    featureBase(docs, text)
      .select(col("doc_id") +: carry.map(col) :+ col("y") :+
        col("x0") :+ col("x1") :+ col("x2") :+ col("x3") :+
        (least(col("__n_chars"), lit(2000L)) / lit(2000.0)).as("x4") :+
        (least(when(col("n_tokens") > 0,
            floor(col("__n_chars") / col("n_tokens"))).otherwise(0L),
          lit(20L)) / lit(20.0)).as("x5"): _*)

  /** Shared lattice plumbing for the feature suppliers: label + the
    * four base dimensions + the raw per-doc counts the extended set
    * derives from.
    */
  private def featureBase(docs: DataFrame, text: String): DataFrame = {
    val t0 = col(text)
    val nChars = length(t0).cast("long")
    val punct = nChars - length(regexp_replace(t0, "[^a-zA-Z0-9\\s]", ""))
    val tokens = split(trim(AsciiLowerFn(t0)), "\\s+")
    val stopArr = array(TextStats.EnglishStopwords.map(lit): _*)
    val stop = size(filter(tokens, tk => array_contains(stopArr, tk))).cast("long")
    TextStats.withQualityColumns(docs, text)
      .withColumn("__n_chars", nChars)
      .withColumn("__punct_pct",
        when(nChars > 0, floor(punct * lit(100L) / nChars)).otherwise(0L))
      .withColumn("__stop_pct",
        when(col("n_tokens") > 0,
          floor(stop * lit(100L) / col("n_tokens"))).otherwise(0L))
      .withColumn("y",
        when(round(col("quality_score"), 6) >= 0.78, 1.0d).otherwise(0.0d))
      .withColumn("x0", lit(1.0))
      .withColumn("x1", least(col("n_tokens"), lit(TokenCap)) / lit(TokenCap.toDouble))
      .withColumn("x2", col("__punct_pct") / lit(100.0))
      .withColumn("x3", col("__stop_pct") / lit(100.0))
  }

  /** The linear response under micro-unit weights — shared by the
    * gradient pass and scoring so train/score cannot drift. Left-
    * assoc sum over however many `x0..x{n-1}` columns the weight
    * vector covers: the feature FRAME is the pluggable surface — any
    * supplier that emits (doc_id, y, x0..x{n-1}) trains and scores
    * through this one path ([[features]] is the 4-dim default,
    * [[featuresExtended]] a 6-dim lattice; a caller's own frame works
    * the same).
    */
  private[ops] def zOf(wMicro: Array[Long]): Column =
    wMicro.indices.map(j => lit(wMicro(j) / 1e6) * col(s"x$j")).reduce(_ + _)

  /** The x0..x{n-1} feature arity of a caller-supplied frame. */
  private def featureArity(feat: DataFrame): Int = {
    val n = Iterator.from(0).indexWhere(j => !feat.columns.contains(s"x$j"))
    require(n >= 1, s"feature frame has no x0..x{n-1} columns: ${feat.columns.mkString(", ")}")
    n
  }

  private[ops] def sigmoid(z: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-z))

  /** `rounds` full-batch GD rounds from w = 0; returns the final
    * micro-unit weights. `feat` should be checkpointed by the caller
    * (it is scanned rounds + 1 times). lrNum is the integer learning
    * rate numerator: Δw_j = (lrNum · Σ round((p−y)·x_j·1e6)) / n, truncating.
    */
  /** trunc(lrNum·g/n) without overflowing the intermediate product.
    * |g| can reach n·1e6 micro-units, so the naive `lrNum * g / n`
    * overflows Long past n ≈ Long.Max/(lrNum·1e6) ≈ 1.4e11 documents
    * at lrNum=64 — a real corpus size at the advertised scale — and
    * an overflowed product silently FLIPS the gradient sign. Split on
    * g = (g/n)·n + (g%n): with n > 0, both JVM divisions truncate
    * toward zero and both addends carry g's sign, so the sum equals
    * the exact truncated quotient bit-for-bit (the oracle's BIGINT
    * `//` replay is unchanged), while the largest intermediate is
    * lrNum·max(|g/n|, n) ≤ lrNum·max(1e6, n) — safe out to
    * n < Long.Max/lrNum ≈ 1.4e17 documents.
    */
  private def scaledStep(lrNum: Long, g: Long, n: Long): Long =
    lrNum * (g / n) + lrNum * (g % n) / n

  def train(feat: DataFrame, rounds: Int, lrNum: Long = 4L): Array[Long] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(lrNum >= 1, s"lrNum must be >= 1, got $lrNum")
    val nFeat = featureArity(feat)
    val w = Array.fill(nFeat)(0L)
    var r = 0
    while (r < rounds) {
      val p = sigmoid(zOf(w))
      val gs = (0 until nFeat).map(j =>
        sum(round((p - col("y")) * col(s"x$j") * lit(1e6)).cast("long"))
          .as(s"g$j"))
      val row = feat.agg(gs.head, (gs.tail :+ count(lit(1)).as("n")): _*).head()
      val n = row.getAs[Long]("n")
      require(n > 0, "cannot train on an empty feature frame")
      var j = 0
      while (j < nFeat) {
        // TRUNCATING division, deliberately: DuckDB's BIGINT `//`
        // truncates toward zero (verified: -7 // 2 = -3), matching
        // JVM long division — floorDiv would diverge on every
        // negative gradient
        w(j) -= scaledStep(lrNum, row.getAs[Long](s"g$j"), n)
        j += 1
      }
      r += 1
    }
    w
  }

  /** Score a feature frame under trained micro-unit weights:
    * (doc_id, label, p_hat on the 1e-6 grid, keep = p_hat ≥ ½).
    * p_hat quantizes through the integer micro-unit pattern —
    * round(p·1e6) as a long, divided back — NOT round(p, 6): both
    * engines then round the SAME double product, where a 6-dp decimal
    * round of an arbitrary probability hits the documented
    * cross-engine grid-boundary divergence (measured: 38/500 docs at
    * sf0.01, repeated feature vectors amplify every unlucky value).
    * The keep decision compares the quantized probability so the cut
    * is the same on any engine.
    */
  def scoreWith(feat: DataFrame, wMicro: Array[Long],
      carry: Seq[String] = Nil): DataFrame = {
    require(wMicro.length == featureArity(feat),
      s"weight/feature arity mismatch: ${wMicro.length} weights for " +
        s"${featureArity(feat)} x-columns")
    feat.select(col("doc_id") +: carry.map(col) :+
        col("y").cast("long").as("label") :+
        ((round(sigmoid(zOf(wMicro)) * lit(1e6)).cast("long") / lit(1e6))
          .as("p_hat")): _*)
      .withColumn("keep", col("p_hat") >= 0.5)
  }

  /** Persist trained micro-unit weights (the [[Similarity.saveCodebook]]
    * pattern): the model artifact the serving job loads, closing the
    * train-offline / score-online loop with a literal file instead of
    * an in-process array. Weights are exact integers, so the round
    * trip is bit-identical.
    */
  def saveWeights(spark: org.apache.spark.sql.SparkSession, path: String,
      wMicro: Array[Long]): Unit = {
    require(wMicro.nonEmpty, "cannot persist an empty weight vector")
    import spark.implicits._
    wMicro.toSeq.zipWithIndex.map { case (w, j) => (j, w) }
      .toDF("j", "w_micro")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Restore [[saveWeights]] state; fails loudly on a gap in the
    * 0..n-1 index sequence. A truncated TAIL is invisible from the
    * file alone — n is inferred from the max index — so callers that
    * know their feature arity pass `expectedN` to close that hole
    * (the [[Pq.loadPqCodebooks]] `expectedM` discipline).
    */
  def loadWeights(spark: org.apache.spark.sql.SparkSession,
      path: String, expectedN: Int = -1): Array[Long] = {
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getInt(r.fieldIndex("j")), r.getLong(r.fieldIndex("w_micro"))))
      .sortBy(_._1)
    val n = if (expectedN > 0) expectedN else rows.length
    require(rows.nonEmpty && rows.map(_._1).toSeq == (0 until n),
      s"weight file at $path is not a contiguous 0..${n - 1} model " +
        s"(a partial write would silently drop features): ${rows.toSeq}")
    rows.map(_._2)
  }

  /** End-to-end: featurize, train `rounds` GD rounds, score the corpus
    * under the trained model.
    */
  def trainAndScore(docs: DataFrame, rounds: Int = 3, lrNum: Long = 4L,
      text: String = "text"): DataFrame = {
    // spread before the regex-heavy featurization (single-split trap,
    // the scoreLinear rationale); batch-only path, so the exchange
    // never touches the streaming twins
    val feat = features(spread(docs), text).localCheckpoint(true)
    scoreWith(feat, train(feat, rounds, lrNum))
  }

  /** Round-robin spread for single-split corpora ahead of the heavy
    * per-row featurization; AQE coalesces the no-op exchange when the
    * input already has enough splits (the scoreLinear rationale).
    * Batch frames only — the streaming scorers stay map-only.
    */
  private[ops] def spread(docs: DataFrame): DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)

  /** [[trainAndScore]] on the extended 6-feature lattice — the same
    * train/score path fed a different supplier; nothing downstream
    * changes except the weight arity.
    */
  def trainAndScoreExtended(docs: DataFrame, rounds: Int = 3, lrNum: Long = 4L,
      text: String = "text"): DataFrame = {
    val feat = featuresExtended(spread(docs), text).localCheckpoint(true)
    scoreWith(feat, train(feat, rounds, lrNum))
  }

  // --- hashed-feature variant (the DCLM/fastText shape proper) ------
  //
  // p57 trains 4 hand-picked lattice dimensions; this trains a weight
  // PER HASHED N-GRAM BUCKET — the feature space DCLM's fastText
  // classifier actually uses (p43's lattice, now learned instead of
  // frozen). x_b = count_b / n_grams (bag-of-grams shares), so the
  // per-OCCURRENCE gradient contribution round((p−y)/n·1e6) is one
  // integer and a bucket's gradient is an exact integer sum of them.
  // Each round: one explode + map-side-combined aggregation to ≤ B
  // rows, collected; the model is B driver-side longs; scoring folds
  // the weight array as a plan literal (the p58 pattern) — map-only.

  /** (doc_id, y, n_feat, bk): hashed uni+bigram bucket ids per doc
    * (the p43 gram definition), label from the p8 rule.
    */
  def hashedFeatures(docs: DataFrame, nBuckets: Int,
      text: String = "text", carry: Seq[String] = Nil): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val tk = split(trim(lower(col(text))), "\\s+")
    val bigrams = zip_with(
      slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
      slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val grams = concat(tk, bigrams)
    val bk = when(col(text).isNull || trim(col(text)) === "",
        array().cast("array<int>"))
      .otherwise(transform(grams,
        g => (graft.functions.Md5Hex64Fn(g) % nBuckets).cast("int")))
    // spread BEFORE the quality columns: the repartition used to sit
    // above them, which left the regex-heavy quality projection inside
    // the single-split scan task (measured: a 1-task ~0.5 s stage in
    // every p77/p85/p88 pass) — projections do not migrate across a
    // round-robin exchange
    TextStats.withQualityColumns(
        docs.repartition(docs.sparkSession.sparkContext.defaultParallelism),
        text)
      .select(col("doc_id") +: carry.map(col) :+
        when(round(col("quality_score"), 6) >= 0.78, 1.0d)
          .otherwise(0.0d).as("y") :+
        bk.as("bk"): _*)
      .withColumn("n_feat", size(col("bk")).cast("long"))
  }

  /** Per-row linear response under a literal micro-unit weight array:
    * z = (Σ_occurrences w[bucket]) / n_feat / 1e6, 0 for featureless
    * rows (p = ½ there, and they shed no gradient).
    */
  private[ops] def zHashed(wMicro: Array[Long]): Column = {
    val wArr = array(wMicro.map(lit): _*)
    val zsum = aggregate(
      transform(col("bk"), b => element_at(wArr, b + 1)),
      lit(0L), (acc, x) => acc + x)
    when(col("n_feat") > 0, zsum / col("n_feat") / lit(1e6))
      .otherwise(lit(0.0))
  }

  /** `rounds` full-batch GD rounds over `nBuckets` hashed features;
    * returns the micro-unit weight array. Each round is one exploded
    * bucket aggregation (≤ nBuckets result rows) + a driver update —
    * the same bounded-state contract as [[train]], with B longs
    * instead of 4.
    */
  def trainHashed(feat: DataFrame, nBuckets: Int, rounds: Int,
      lrNum: Long = 64L): Array[Long] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(lrNum >= 1, s"lrNum must be >= 1, got $lrNum")
    val n = feat.count()
    require(n > 0, "cannot train on an empty feature frame")
    val w = Array.fill(nBuckets)(0L)
    var r = 0
    while (r < rounds) {
      val p = sigmoid(zHashed(w))
      val contrib =
        round((p - col("y")) / col("n_feat") * lit(1e6)).cast("long")
      val g = feat.where(col("n_feat") > 0)
        .select(contrib.as("__c"), explode(col("bk")).as("__b"))
        .groupBy(col("__b")).agg(sum(col("__c")).as("__g"))
        .collect().map(row => (row.getInt(0), row.getLong(1)))
      g.foreach { case (b, gb) => w(b) -= scaledStep(lrNum, gb, n) }
      r += 1
    }
    w
  }

  /** Score under trained hashed weights: (doc_id, label, p_hat on the
    * 1e-6 grid, keep) — identical output contract to [[scoreWith]],
    * map-only (the weight array rides the plan as a literal).
    */
  def scoreHashed(feat: DataFrame, wMicro: Array[Long],
      carry: Seq[String] = Nil): DataFrame =
    feat.select(col("doc_id") +: carry.map(col) :+
        col("y").cast("long").as("label") :+
        ((round(sigmoid(zHashed(wMicro)) * lit(1e6)).cast("long") / lit(1e6))
          .as("p_hat")): _*)
      .withColumn("keep", col("p_hat") >= 0.5)

  /** End-to-end hashed-feature pipeline. */
  def trainAndScoreHashed(docs: DataFrame, nBuckets: Int = 64,
      rounds: Int = 2, lrNum: Long = 64L,
      text: String = "text"): DataFrame = {
    val feat = hashedFeatures(docs, nBuckets, text).localCheckpoint(true)
    scoreHashed(feat, trainHashed(feat, nBuckets, rounds, lrNum))
  }
}
