package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training — the OTHER
  * production tokenizer family next to BPE (Kudo 2018): pieces carry
  * probabilities and words segment by maximum likelihood, instead of
  * replaying a merge history. This implements ONE deterministic EM
  * round — the fixed-round discipline the k-means codebook and BPE
  * oracles already use (3 Lloyd rounds / 8 merges):
  *
  *  1. word table: ONE corpus pass, capped to the `maxWords` most
  *     frequent words ([[Bpe.wordCounts]] — shared definition, the
  *     trainers cannot drift);
  *  2. seed vocabulary: every substring of length 1..`maxPieceLen` of
  *     every capped word, frequency-weighted by word count; keep the
  *     `vocabSize` most frequent PLUS every single character (full
  *     segmentability — the standard unigram fallback alphabet);
  *  3. seed scores: integer MICRO-LOGS, round((ln f − ln T)·1e6) as a
  *     long (T = total seed frequency). Integer scores make every
  *     Viterbi comparison EXACT — cross-engine float drift is
  *     quantized away at derivation time, the same trick as the
  *     k-means 6-dp centroid lattice; boundary coincidence of ln()
  *     against the 1e-6 grid is ~1e-8 per piece;
  *  4. E-step: Viterbi-segment each capped word (max Σ score, arcs ≤
  *     maxPieceLen, ties → the SMALLEST start index, i.e. the longest
  *     final piece — a deterministic local rule any engine replays);
  *  5. M-step: piece usage counts weighted by word frequency, and
  *     re-estimated probabilities n_uses / Σ n_uses.
  *
  * The per-word DP is a data-dependent sequential loop (no codegen
  * expression expresses it) over the BOUNDED word table — it runs as
  * a scalar UDF with the score map on the closure (≤ vocabSize +
  * alphabet entries), the same tier as BPE's encode. The corpus is
  * touched exactly once (the word count); everything else is
  * word-table-sized. Further EM rounds repeat steps 4-5 with the
  * M-step estimates — the machinery is identical, so the single round
  * is the oracle-checked unit.
  */
object UnigramLm {

  /** Integer micro-log score: round((ln f − ln T)·1e6), HALF_UP away
    * from zero — the rounding both Spark and DuckDB's round() apply,
    * so the score tables are engine-identical.
    */
  private[ops] def microLog(f: Long, t: Long): Long =
    BigDecimal((math.log(f.toDouble) - math.log(t.toDouble)) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Viterbi segmentation under integer scores: maximize the score
    * sum over arcs of length ≤ maxPieceLen whose piece is scored;
    * ties prefer the smaller start index (ascending-j scan with
    * strict improvement — the first argmax wins, which is the longest
    * final piece). Single characters are always scored, so every
    * word segments.
    */
  private[ops] def viterbi(scores: Map[String, Long], maxPieceLen: Int,
      w: String): Seq[String] = {
    val n = w.length
    if (n == 0) return Nil
    val Neg = Long.MinValue / 4
    val dp = Array.fill(n + 1)(Neg)
    val bk = Array.fill(n + 1)(-1)
    dp(0) = 0L
    var k = 1
    while (k <= n) {
      var j = math.max(0, k - maxPieceLen)
      while (j < k) {
        if (dp(j) > Neg) scores.get(w.substring(j, k)).foreach { s =>
          if (dp(j) + s > dp(k)) { dp(k) = dp(j) + s; bk(k) = j }
        }
        j += 1
      }
      k += 1
    }
    var acc = List.empty[String]
    var kk = n
    while (kk > 0) { val j = bk(kk); acc = w.substring(j, kk) :: acc; kk = j }
    acc
  }

  /** Seed-piece frequencies over the capped word table: the
    * `vocabSize` most frequent substrings of length 1..`maxPieceLen`
    * PLUS every single character (full segmentability — the standard
    * unigram fallback alphabet). Returned as the bounded driver-side
    * artifact (≤ vocabSize + alphabet rows) — the k-means
    * centroid-collect discipline.
    */
  private[ops] def seedPieces(cap: DataFrame, maxPieceLen: Int,
      vocabSize: Int): Array[(String, Long)] = {
    // all substrings as one per-row array build (positions x lengths),
    // exploded and summed
    val pf = cap.select(col("freq"), explode(flatten(transform(
        sequence(lit(1), length(col("word"))), p =>
          transform(
            sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - p + 1)),
            l => col("word").substr(p, l))))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("f"))
      .localCheckpoint(true) // read twice: top-k and the char alphabet
    pf.orderBy(col("f").desc, col("piece").asc).limit(vocabSize)
      .unionByName(pf.where(length(col("piece")) === 1))
      .distinct()
      .collect().map(r => (r.getString(0), r.getAs[Number](1).longValue()))
  }

  /** Integer micro-log score table from piece frequencies. */
  private[ops] def scoreTable(freqs: Seq[(String, Long)]): Map[String, Long] = {
    val t = freqs.map(_._2).sum
    freqs.map { case (p, f) => p -> microLog(f, t) }.toMap
  }

  /** One E-step: Viterbi-segment the capped word table under `scores`
    * and return frequency-weighted piece usage counts.
    */
  private def usage(cap: DataFrame, scores: Map[String, Long],
      maxPieceLen: Int): DataFrame = {
    val mpl = maxPieceLen
    val seg = udf((w: String) => viterbi(scores, mpl, w))
    cap.select(col("freq"), explode(seg(col("word"))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("n_uses"))
  }

  /** M-step re-estimation: used pieces keep their counts, the seed
    * alphabet floors at frequency 1 so pruning never strands a word.
    */
  private def reestimate(uses: DataFrame,
      alphabet: Seq[String]): Seq[(String, Long)] = {
    val used = uses.collect()
      .map(row => (row.getString(0), row.getAs[Number](1).longValue())).toMap
    (used ++ alphabet.filterNot(used.contains).map(_ -> 1L)).toSeq
  }

  /** `rounds` EM rounds; returns (piece, n_uses, est_prob) from the
    * final E-step. Re-estimation after each round derives the next
    * score table from the usage counts, with the single-character
    * alphabet floored at frequency 1 so every word stays segmentable
    * after zero-use pieces prune out (the standard unigram fallback
    * alphabet, applied to re-estimation). Round 1 is the
    * oracle-checked unit; convergence typically reaches a fixed point
    * within a round or two on natural corpora (spec-pinned).
    */
  def train(docs: DataFrame, maxPieceLen: Int = 4, vocabSize: Int = 64,
      maxWords: Int = 32768, text: String = "text", rounds: Int = 1): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val cap = Bpe.wordCounts(docs, maxWords, text).localCheckpoint(true)
    val v = seedPieces(cap, maxPieceLen, vocabSize)
    val alphabet = v.collect { case (p, _) if p.length == 1 => p }.toSeq

    var freqs: Seq[(String, Long)] = v.toSeq
    var uses: DataFrame = usage(cap, scoreTable(freqs), maxPieceLen)
    var r = 1
    while (r < rounds) {
      freqs = reestimate(uses, alphabet)
      uses = usage(cap, scoreTable(freqs), maxPieceLen)
      r += 1
    }
    val tu = uses.agg(sum("n_uses").as("__t"))
    uses.crossJoin(broadcast(tu))
      .select(col("piece"), col("n_uses"),
        round(col("n_uses") / col("__t"), 6).as("est_prob"))
  }

  /** CCNet-style LM-perplexity quality split (Wenzek et al. 2020):
    * score every document by its per-token log-probability under the
    * round-1-trained unigram LM, then bucket head/middle/tail at
    * per-language terciles. CCNet scores with a pre-trained KenLM;
    * the self-trained unigram round is this engine's deterministic,
    * oracle-replayable analog — a production deployment swaps the
    * score table for a shipped model and keeps everything downstream.
    *
    *  1. train: seed vocabulary → round-1 E-step → M-step
    *     re-estimation — EXACTLY the score table a second EM round
    *     would segment under (the p53-verified rule), frozen as the
    *     scoring LM;
    *  2. score every DISTINCT corpus word once (the p50 apply-chain
    *     shape: the DP cost is word-table-sized, never corpus-sized);
    *     a word containing a character outside the trained alphabet
    *     cannot segment and is skipped — the OOV-drop contract, which
    *     inner joins replay exactly on any engine;
    *  3. per-document totals: one join of exploded doc words to the
    *     word-score table, Σ micro-log and Σ pieces; `lm_score` =
    *     micro-log per token (6 dp) — monotone in -log(perplexity),
    *     higher = more probable text;
    *  4. per-language tercile split via ONE percentile aggregation
    *     broadcast back ([[Profiling.tercileBuckets]]) — never
    *     CCNet's corpus-wide sort.
    *
    * At 100 TB the corpus is touched twice (word count, doc-word
    * join); the DP runs over the bounded distinct-word table; the
    * score table is a broadcast closure; the tercile boundary agg is
    * language-cardinality-sized.
    */
  def perplexityBuckets(docs: DataFrame, maxPieceLen: Int = 4,
      vocabSize: Int = 64, maxWords: Int = 32768,
      text: String = "text"): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val cap = Bpe.wordCounts(docs, maxWords, text).localCheckpoint(true)
    val v = seedPieces(cap, maxPieceLen, vocabSize)
    val alphabet = v.collect { case (p, _) if p.length == 1 => p }.toSeq
    val trained = reestimate(usage(cap, scoreTable(v.toSeq), maxPieceLen), alphabet)
    val scores = scoreTable(trained)
    val mpl = maxPieceLen
    // per-word (Σ micro-log, n pieces); None = un-segmentable (OOV char)
    val wsc = udf { (w: String) =>
      if (w.forall(c => scores.contains(c.toString))) {
        val ps = viterbi(scores, mpl, w)
        Some((ps.map(scores).sum, ps.length))
      } else None
    }
    val tok = explode(split(trim(lower(col(text))), "\\s+")).as("word")
    val words = docs.select(tok).where(col("word") =!= "").distinct()
      .withColumn("__ws", wsc(col("word")))
      .where(col("__ws").isNotNull)
    val scored = docs.select(col("doc_id"), col("lang"), tok)
      .where(col("word") =!= "")
      .join(words, "word")
      .groupBy("doc_id", "lang")
      .agg(sum(col("__ws._1")).as("total_micro"),
        sum(col("__ws._2")).cast("long").as("n_tokens"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        round(col("total_micro") / col("n_tokens"), 6).as("lm_score"))
    Profiling.tercileBuckets(scored, Seq("lang"), "lm_score")
  }
}
