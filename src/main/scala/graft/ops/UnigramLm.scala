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
    // seed-piece frequencies: all substrings up to maxPieceLen as one
    // per-row array build (positions x lengths), exploded and summed
    val pf = cap.select(col("freq"), explode(flatten(transform(
        sequence(lit(1), length(col("word"))), p =>
          transform(
            sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - p + 1)),
            l => col("word").substr(p, l))))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("f"))
      .localCheckpoint(true) // read twice: top-k and the char alphabet
    val vocab = pf.orderBy(col("f").desc, col("piece").asc).limit(vocabSize)
      .unionByName(pf.where(length(col("piece")) === 1))
      .distinct()
    // the score table is the bounded broadcast artifact (≤ vocabSize
    // + alphabet rows) — the k-means centroid-collect discipline
    val v = vocab.collect().map(r => (r.getString(0), r.getAs[Number](1).longValue()))
    val alphabet = v.collect { case (p, _) if p.length == 1 => p }
    val mpl = maxPieceLen

    def eStep(freqs: Seq[(String, Long)]): DataFrame = {
      val t = freqs.map(_._2).sum
      val scores: Map[String, Long] =
        freqs.map { case (p, f) => p -> microLog(f, t) }.toMap
      val seg = udf((w: String) => viterbi(scores, mpl, w))
      cap.select(col("freq"), explode(seg(col("word"))).as("piece"))
        .groupBy("piece").agg(sum("freq").as("n_uses"))
    }

    var freqs: Seq[(String, Long)] = v.toSeq
    var uses: DataFrame = eStep(freqs)
    var r = 1
    while (r < rounds) {
      // M → next round's score table: used pieces keep their counts,
      // the alphabet floors at 1 so pruning never strands a word
      val used = uses.collect()
        .map(row => (row.getString(0), row.getAs[Number](1).longValue())).toMap
      freqs = (used ++ alphabet.filterNot(used.contains).map(_ -> 1L)).toSeq
      uses = eStep(freqs)
      r += 1
    }
    val tu = uses.agg(sum("n_uses").as("__t"))
    uses.crossJoin(broadcast(tu))
      .select(col("piece"), col("n_uses"),
        round(col("n_uses") / col("__t"), 6).as("est_prob"))
  }
}
