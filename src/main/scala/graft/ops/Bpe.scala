package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: merge-rule learning + encoding — the
  * subword step every production pretraining pipeline runs after
  * (or instead of) p47's word-level vocabulary (Sennrich et al. 2016,
  * the GPT-2/LLaMA tokenizer-training shape).
  *
  * Training (the Lloyd-loop discipline, applied to merges):
  *  - ONE corpus pass aggregates word frequencies (map-side combine),
  *    capped to the `maxWords` most frequent words — the same bounded-
  *    artifact contract as `TextStats.buildVocab`: the type/token
  *    ratio keeps distinct words far below corpus size, and the cap
  *    makes the bound explicit. Everything after runs on that word
  *    table, NEVER the corpus.
  *  - each merge round is one bounded aggregation over the word
  *    table: adjacent symbol pairs (a zip_with of two slices —
  *    per-row array math), weighted by word frequency, summed with
  *    map-side partials; the arg-max pair (count desc, then
  *    lexicographic (lhs, rhs) asc — a TOTAL order, so the sequence
  *    is deterministic and any SQL engine replays it) is a 1-row
  *    collect, exactly the k-means centroid-collect discipline.
  *  - the chosen merge applies as a per-row left-to-right greedy fold
  *    over each word's symbol array (`aggregate` — "aaa" under (a,a)
  *    merges to [aa, a], the standard non-overlapping semantics);
  *    `localCheckpoint` truncates lineage each round so R rounds
  *    never stack R plans.
  *
  * 100 TB: the corpus is touched once; round cost depends on
  * `maxWords` and word length only. Rounds are sequential by nature
  * (merge r+1's counts depend on merge r) — that is BPE, not a plan
  * artifact; production merge counts (~30k) put the fit in
  * bounded-minutes territory on the capped table, independent of
  * corpus size.
  *
  * Encoding applies the learned ranks per word: repeatedly merge the
  * lowest-rank adjacent pair (all its occurrences, left-to-right)
  * until none applies — the standard BPE encode loop. The loop is
  * inherently sequential and data-dependent per word, which no
  * codegen expression expresses; it runs as a deterministic scalar
  * UDF over a BROADCAST rank map (bounded by numMerges), the
  * documented last-resort tier — state-free, per-row, no shuffle.
  */
object Bpe {

  /** One learned merge: at `rank`, adjacent (`lhs`,`rhs`) fuse into
    * `merged` (= lhs+rhs); `pairCount` is the weighted adjacency
    * count that won the round.
    */
  case class Merge(rank: Int, lhs: String, rhs: String, merged: String, pairCount: Long)

  /** End-of-word sentinel symbol (Sennrich's `</w>`): makes word
    * boundaries mergeable content, so "low" and "lower" learn
    * different final units. Words come from whitespace splits, so no
    * real symbol can collide with it.
    */
  val EndOfWord = "</w>"

  /** Greedy left-to-right single-merge application as a codegen array
    * fold: append each symbol unless the accumulator ends with `l`
    * and the symbol is `r` — then replace the tail with `m`. The fold
    * order gives the standard non-overlapping semantics ("aaa" under
    * (a,a) -> [aa, a]).
    */
  private def applyMergeCol(pieces: Column, l: String, r: String, m: String): Column =
    aggregate(pieces, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === l && x === r,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
          .otherwise(concat(acc, array(x))))

  /** Word-frequency table: the ONE corpus pass (p47's buildVocab
    * aggregation), capped to the `maxWords` most frequent words by
    * (count desc, word asc). Shared with [[UnigramLm]] — one word
    * definition, so the two tokenizer trainers cannot drift.
    */
  private[ops] def wordCounts(docs: DataFrame, maxWords: Int, text: String): DataFrame = {
    val spark = docs.sparkSession
    docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(explode(split(trim(lower(col(text))), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxWords)
  }

  /** Learn `numMerges` merge rules from the corpus (fewer if the word
    * table exhausts — every word one symbol). Deterministic: exact
    * integer counts, totally-ordered tie-break.
    */
  def learnMerges(docs: DataFrame, numMerges: Int, maxWords: Int = 32768,
      text: String = "text"): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    var words = wordCounts(docs, maxWords, text)
      .withColumn("pieces", concat(split(col("word"), ""), array(lit(EndOfWord))))
      .select("freq", "pieces")
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var round = 1
    var exhausted = false
    while (round <= numMerges && !exhausted) {
      val top = words
        .select(col("freq"), explode(zip_with(
          slice(col("pieces"), lit(1), size(col("pieces")) - 1),
          slice(col("pieces"), lit(2), size(col("pieces")) - 1),
          (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Merge(round, l, r, l + r, c)
        words = words
          .withColumn("pieces", applyMergeCol(col("pieces"), l, r, l + r))
        // Lineage control, not per-round materialization: the word
        // table is maxWords-bounded and every merge application is a
        // narrow per-row array fold, so re-deriving round r's table
        // from the last checkpoint costs r bounded map passes — far
        // cheaper than an eager materialization job EVERY round
        // (measured: the per-round checkpoint was ~2 jobs/round of
        // pure overhead at numMerges=8; the default fits pay zero
        // intermediate checkpoints now). Checkpoint every 16 rounds so
        // production merge counts (~30k) still never stack unbounded
        // plans. Deterministic either way — the merges are identical.
        if (round % 16 == 0) words = words.localCheckpoint(true)
        round += 1
      }
    }
    out.toSeq
  }

  /** [[learnMerges]] as a DataFrame (rank, lhs, rhs, merged,
    * pair_count) — the artifact a pipeline persists next to its data.
    */
  def train(docs: DataFrame, numMerges: Int, maxWords: Int = 32768,
      text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnMerges(docs, numMerges, maxWords, text)
      .map(m => (m.rank.toLong, m.lhs, m.rhs, m.merged, m.pairCount))
      .toDF("rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Encode one word by applying the learned merges IN RANK ORDER
    * (each all-occurrences, left-to-right greedy) — subword-nmt's
    * ordered-apply semantics, which is literally a replay of training:
    * training-corpus words reproduce their training segmentation, and
    * the declarative [[encodeCorpus]] computes the identical function
    * (one fold per merge), so the scalar and corpus paths can never
    * disagree. Production tokenizers run the same function through a
    * lowest-rank-first priority queue — an execution strategy, not a
    * different result on any word whose pairs the ordered pass can
    * form. Pure and deterministic (spec-pinned directly).
    */
  def encodeWord(ranks: Map[(String, String), Int], word: String): Seq[String] =
    encodeWordOrdered(ranks.toSeq.sortBy(_._2).map(_._1), word)

  /** The PRODUCTION per-word encode: repeatedly find the LOWEST-RANK
    * adjacent pair present in the word and merge all its occurrences
    * left-to-right, until no adjacent pair is in the rank map — the
    * subword-nmt/GPT-2 encode loop proper. Per-word cost is
    * O(appliedMerges × |word|) hash lookups, INDEPENDENT of the merge
    * count M — the property that makes a 30k-merge production
    * tokenizer feasible, where [[encodeWordOrdered]]'s single ordered
    * pass costs O(M × |word|) per word (fine at query-sized M,
    * measured 600× slower at M = 30k; BASELINE.md round 10).
    *
    * Equal to [[encodeWordOrdered]] on any TRAINED merge list, for any
    * word: training creates token t at rank r, so every merge
    * consuming t has rank > r — a merge application can only create
    * HIGHER-rank pairs, which the ordered pass (ascending ranks, all
    * occurrences per rank) therefore never misses, and picking the
    * current minimum rank first replays the identical sequence. The
    * equivalence is structural in the merge list, not in the word
    * (BpeSpec pins it on trained merges over corpus AND novel words).
    * An arbitrary HAND-BUILT rank map can violate the provenance
    * property (a low-rank pair only formable by a high-rank merge)
    * and then the two strategies legitimately differ — train first.
    */
  def encodeWordRanked(ranks: Map[(String, String), Int], word: String): Seq[String] = {
    var pieces: Vector[String] = word.map(_.toString).toVector :+ EndOfWord
    var done = pieces.size < 2
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < pieces.size - 1) {
        val r = ranks.getOrElse((pieces(i), pieces(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0 || bestRank == Int.MaxValue) done = true
      else {
        val l = pieces(best)
        val r = pieces(best + 1)
        val m = l + r
        val b = Vector.newBuilder[String]
        var j = 0
        while (j < pieces.size) {
          if (j + 1 < pieces.size && pieces(j) == l && pieces(j + 1) == r) { b += m; j += 2 }
          else { b += pieces(j); j += 1 }
        }
        pieces = b.result()
        if (pieces.size < 2) done = true
      }
    }
    pieces
  }

  /** [[encodeWord]] against a PRE-SORTED merge list. The sort is
    * hoisted out because the corpus path calls this once per word per
    * document: re-sorting a production-sized rank map (≈30k merges,
    * O(M log M)) inside the per-word loop would dominate the encode.
    */
  def encodeWordOrdered(ordered: Seq[(String, String)], word: String): Seq[String] = {
    var pieces: Vector[String] = word.map(_.toString).toVector :+ EndOfWord
    for ((l, r) <- ordered) {
      val m = l + r
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < pieces.size) {
        if (i + 1 < pieces.size && pieces(i) == l && pieces(i + 1) == r) { b += m; i += 2 }
        else { b += pieces(i); i += 1 }
      }
      pieces = b.result()
    }
    pieces
  }

  /** DECLARATIVE corpus encode — the scale path, fully
    * oracle-replayable: derive the piece sequence of every DISTINCT
    * corpus word by folding the learned merges in rank order (one
    * codegen array fold per merge — identical results to
    * [[encodeWord]] by construction), then join the bounded
    * word→pieces table back to per-document word positions and emit
    * each document's token count plus an order-sensitive integer
    * fingerprint Σ (globalTokenPos) · (hex64(piece) % 1000 + 1) —
    * exact arithmetic, so a merge slip, piece reorder, or lost token
    * moves the hash (the p47 fingerprint discipline).
    *
    * Shape: the distinct-word table is type/token-bounded and stays a
    * DataFrame (never collected); the join against it broadcasts at
    * vocab scale; the only window is PER DOCUMENT (token offsets from
    * preceding words), never corpus-global. The merge fold nests one
    * projection per merge — right for query-sized merge lists; a
    * production 30k-merge encode uses [[encode]]'s broadcast-rank-map
    * form instead (same function, sequential execution).
    */
  def encodeCorpus(docs: DataFrame, merges: Seq[Merge], id: String = "doc_id",
      text: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the trade is ENFORCED, not advisory: each merge nests one
    // projection, so a production-sized merge list would build a
    // 30k-deep plan here — that workload belongs to [[encode]]'s
    // broadcast-rank-map form (the same function, sequential
    // execution)
    require(merges.size <= 64,
      s"encodeCorpus folds one projection per merge and got ${merges.size} " +
        "merges; use Bpe.encode (broadcast rank map) for production-sized merge lists")
    val spark = docs.sparkSession
    val words0 = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(explode(split(trim(lower(col(text))), "\\s+")).as("word"))
      .where(col("word") =!= "").distinct()
    val pieces = merges.sortBy(_.rank).foldLeft(
        words0.withColumn("pieces",
          concat(split(col("word"), ""), array(lit(EndOfWord))))) {
        (df, m) => df.withColumn("pieces", applyMergeCol(col("pieces"), m.lhs, m.rhs, m.merged))
      }
      .select(col("word"), col("pieces"), size(col("pieces")).as("np"))
    val docWords = docs
      .select(col(id), posexplode(split(trim(lower(col(text))), "\\s+")).as(Seq("wpos", "word")))
      .where(col("word") =!= "")
    val offWin = Window.partitionBy(col(id)).orderBy(col("wpos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docWords.join(pieces, Seq("word"))
      .withColumn("off", coalesce(sum(col("np").cast("long")).over(offWin), lit(0L)))
      .withColumn("fp", aggregate(
        zip_with(col("pieces"), sequence(lit(1), col("np")), (s, i) =>
          (col("off") + i.cast("long")) *
            (graft.functions.Md5Hex64Fn(s) % 1000L + 1L)),
        lit(0L), (a, x) => a + x))
      .groupBy(col(id))
      .agg(sum(col("np").cast("long")).as("n_tokens"), sum(col("fp")).as("tokens_fp"))
  }

  /** Per-group tokenizer quality table: fertility (tokens per word)
    * and compression (chars per token) — the metrics tokenizer work
    * is actually judged by (a tokenizer trained on English typically
    * shows fertility ≈ 1.1–1.3 there and 2–4× that on unseen
    * languages, which is how under-served languages are detected in a
    * multilingual corpus). One encode pass joined to per-document
    * word/char counts, aggregated to |groups| rows: exact integer
    * sums, two 6-dp float sites (the final ratios of exactly-
    * representable longs — the p72 discipline). NULL ratios when a
    * group has no words/tokens.
    *
    * Encode tier: merge lists at or under [[encodeCorpus]]'s 64-merge
    * cap route through the declarative fold (oracle-replayable — the
    * p78 query's regime); anything larger routes through [[encode]]'s
    * broadcast-rank-map production tier automatically, so the metric
    * runs at the 30k-merge scale it is actually judged in (the two
    * tiers compute the same n_tokens — BpeSpec pins strategy
    * equivalence on trained merges).
    */
  def fertilityStats(docs: DataFrame, merges: Seq[Merge],
      group: String = "lang", id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val words = docs.select(col(id), col(group),
      size(filter(split(trim(lower(col(text))), "\\s+"), w => w =!= ""))
        .cast("long").as("__nw"),
      length(col(text)).cast("long").as("__nc"))
    val encoded =
      if (merges.size <= 64) encodeCorpus(docs, merges, id, text)
      else encode(docs, merges, id, text)
    words
      .join(encoded.select(col(id), col("n_tokens")), Seq(id))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nw")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"), sum(col("__nc")).as("n_chars"))
      .select(col(group), col("n_docs"), col("n_words"), col("n_tokens"),
        col("n_chars"),
        when(col("n_words") > 0,
          round(col("n_tokens").cast("double") / col("n_words").cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("fertility"),
        when(col("n_tokens") > 0,
          round(col("n_chars").cast("double") / col("n_tokens").cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("chars_per_token"))
  }

  /** Corpus encode: per document, whitespace-split then
    * [[encodeWordRanked]] each word against the broadcast rank map.
    * Emits (id, n_tokens, tokens) — per-row math, zero shuffle; the
    * merge table is the only state and it is numMerges-bounded, and
    * the lowest-rank-first per-word loop makes the per-word cost
    * independent of the merge count (measured at M = 30k:
    * BASELINE.md round 10 — the ordered-scan form was 600× slower
    * there and is kept only as the small-M equivalence witness).
    */
  def encode(docs: DataFrame, merges: Seq[Merge], id: String = "doc_id",
      text: String = "text"): DataFrame = {
    // the rank map is built ONCE here and rides the UDF closure
    // (broadcast with the task binary), not rebuilt per word
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    val enc = udf { (t: String) =>
      if (t == null) Seq.empty[String]
      else t.trim.toLowerCase.split("\\s+").toSeq
        .filter(_.nonEmpty).flatMap(w => encodeWordRanked(ranks, w))
    }
    docs.select(col(id), enc(col(text)).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
      .select(id, "n_tokens", "tokens")
  }
}
