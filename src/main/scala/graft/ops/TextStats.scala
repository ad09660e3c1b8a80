package graft.ops

import graft.functions.AsciiLowerFn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, document fingerprinting.
  * Pure column math — every operator has a DuckDB oracle.
  */
object TextStats {

  /** Whitespace token count (0 for blank). */
  def tokenCountWs(text: Column): Column =
    when(trim(text) === "", 0).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: letter runs, digit runs, punctuation runs,
    * each optionally preceded by one space (a simplified GPT-style
    * pre-tokenizer over lowercase ASCII).
    */
  val BpePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(AsciiLowerFn(text), lit(BpePattern), lit(0)))

  /** Quality-signal columns (length / punctuation / stopword / word
    * shape), composed into a [0,1] score. Heuristics follow the usual
    * web-corpus filters (length bounds, symbol ratio, stopword floor).
    */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  def withQualityColumns(docs: DataFrame, text: String = "text"): DataFrame = {
    val t = col(text)
    val tokens = split(trim(AsciiLowerFn(t)), "\\s+")
    val nTokens = tokenCountWs(t)
    val nChars = length(t)
    val punct = nChars - length(regexp_replace(t, "[^a-zA-Z0-9\\s]", ""))
    val stopArr = array(EnglishStopwords.map(lit): _*)
    val stop = size(filter(tokens, tk => array_contains(stopArr, tk)))
    docs
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("punct_ratio",
        when(nChars > 0, punct.cast("double") / nChars.cast("double")).otherwise(0.0))
      .withColumn("stopword_ratio",
        when(nTokens > 0, stop.cast("double") / nTokens.cast("double")).otherwise(0.0))
      .withColumn("mean_token_len",
        when(nTokens > 0,
          (length(regexp_replace(trim(t), "\\s+", "")).cast("double")) /
            nTokens.cast("double")).otherwise(0.0))
      .withColumn("quality_score",
        least(lit(1.0), greatest(lit(0.0),
          lit(0.25) * least(nTokens.cast("double") / 20.0, lit(1.0)) +
          lit(0.25) * (lit(1.0) - least(col("punct_ratio") * 5.0, lit(1.0))) +
          lit(0.25) * least(col("stopword_ratio") * 5.0, lit(1.0)) +
          lit(0.25) * when(col("mean_token_len").between(3.0, 10.0), 1.0).otherwise(0.0))))
  }

  /** Language-id stopword tables (tiny n-gram/stopword heuristic). */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "los", "de", "y", "es", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "que"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我"))

  /** Heuristic language id: argmax of per-language stopword occurrence
    * counts; ties and zero evidence resolve to "und" or the first
    * language in table order (deterministic when-chain, mirrored in
    * the oracle).
    */
  def langIdColumns(docs: DataFrame, text: String = "text"): DataFrame = {
    val tokens = split(trim(AsciiLowerFn(col(text))), "\\s+")
    val scored = LangStopwords.foldLeft(docs) { case (df, (lang, words)) =>
      df.withColumn(s"score_$lang",
        size(filter(tokens, tk => array_contains(array(words.map(lit): _*), tk))).cast("long"))
    }
    val scores = LangStopwords.map { case (l, _) => col(s"score_$l") }
    val best = LangStopwords.foldLeft(when(greatest(scores: _*) <= 0, "und")) {
      case (w, (lang, _)) =>
        w.when(col(s"score_$lang") === greatest(scores: _*), lang)
    }
    scored.withColumn("lang_pred", best)
  }

  /** Learned-style linear quality scorer over hashed n-gram features —
    * the production curation stage (the RefinedWeb/DCLM shape) that the
    * [[withQualityColumns]] heuristics stand in for: a linear model
    * w·φ(doc) where φ hashes the document's unigrams + bigrams into
    * `nFeatures` buckets (the hashing trick; Weinberger et al. 2009).
    *
    * Weights here are DERIVED from the feature id by a second
    * [[graft.Hashing.hex64 md5 hash]] — a frozen pseudo-random model
    * the DuckDB oracle can replay exactly. A real trained model swaps
    * one line: broadcast its weight array and replace `weightOf` with
    * an `element_at` lookup; every other part (hashing, folding,
    * thresholding) is the production path.
    *
    * Cross-engine determinism by construction, not by rounding: weights
    * live on an INTEGER lattice (hex64 % 2001 − 1000 ∈ [−1000, 1000])
    * and the per-document fold sums integers — exact and
    * order-independent, so Spark and any SQL engine agree bit-for-bit
    * before the single final division by 1000·n (identical operands ⇒
    * identical double). No accumulated-float ordering hazard anywhere.
    *
    * Scale: pure per-row column math inside codegen (two md5s per
    * gram), zero shuffle, zero weight table to join — the scorer runs
    * at scan speed on 100 TB.
    *
    * Output: `n_features` (gram count), `quality_logit` (mean lattice
    * weight, 6 dp), `keep` (logit > threshold). Blank documents gate to
    * NULL logit / false keep rather than vanishing.
    */
  def scoreLinear(docs: DataFrame, nFeatures: Int = 1024,
      threshold: Double = 0.0, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    require(nFeatures >= 2, s"nFeatures must be >= 2, got $nFeatures")
    // two md5s per gram is the heaviest per-row expression in the text
    // family after the n-gram distinct — spread single-split corpora
    // first (the withRepetitionColumns rationale; at real corpus scale
    // the scan has enough splits and AQE coalesces the no-op exchange)
    val spreadDocs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    val tk = split(trim(lower(col(text))), "\\s+")
    val bigrams = zip_with(
      slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
      slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val grams = concat(tk, bigrams)
    def weightOf(g: Column): Column =
      graft.functions.Md5Hex64Fn(
        concat(lit("w:"), (graft.functions.Md5Hex64Fn(g) % nFeatures).cast("string"))
      ) % 2001L - 1000L
    val sumW = aggregate(grams, lit(0L), (acc, g) => acc + weightOf(g))
    val n = size(grams)
    spreadDocs
      // null text takes the blank-document path explicitly: without the
      // isNull gate the when() predicate evaluates NULL and falls to
      // otherwise(size(null)) = NULL, diverging from the SQL twin's
      // LEFT JOIN + coalesce(n, 0) formulation
      .withColumn("__n",
        when(col(text).isNull || trim(col(text)) === "", 0).otherwise(n))
      .withColumn("__sw", when(col("__n") > 0, sumW))
      .withColumn("n_features", col("__n").cast("long"))
      .withColumn("quality_logit",
        when(col("__n") > 0,
          round(col("__sw").cast("double") / (col("__n") * 1000.0), 6)))
      .withColumn("keep",
        coalesce(col("__sw").cast("double") / (col("__n") * 1000.0) > threshold,
          lit(false)))
      .drop("__n", "__sw")
  }

  /** Corpus token vocabulary — the word-level tokenizer-training step
    * (the k most frequent whitespace tokens, ranked count-desc with a
    * token-asc tie-break so the id assignment is deterministic and
    * append-stable under re-ranking of equal-count tails). Ids are
    * 1..k; 0 is reserved for OOV in [[encodeFingerprint]].
    *
    * Scale: one token aggregation with map-side partials + one
    * vocabulary-sized top-k — the vocab is a bounded artifact
    * (typically 32k-256k entries) that BROADCASTS to every encode.
    */
  def buildVocab(docs: DataFrame, k: Int, text: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = docs.sparkSession
    docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(explode(split(trim(lower(col(text))), "\\s+")).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)
      .withColumn("token_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n_occurrences").desc, col("token").asc)).cast("long"))
      .select("token_id", "token", "n_occurrences")
  }

  /** Exact integer budget allocation over groups by weight — the
    * largest-remainder method (Hamilton apportionment) on the micro
    * grid: budget_g = floor(k·w_g / Σw), then the k − Σfloor leftover
    * seats go to the largest remainders (ties broken by group asc).
    * All-integer ⇒ bit-replayable in SQL; Σ budget = k EXACTLY.
    *
    * This is the INTERVENTION half of the p78 fertility monitor: feed
    * it per-language fertility micros (an under-served language has
    * high fertility ⇒ high weight ⇒ larger vocab share) and pass the
    * result to [[buildVocabPerGroup]]. The frame is |groups|-sized —
    * the windows here never see a corpus row.
    */
  def vocabBudgets(weights: DataFrame, k: Int, group: String = "lang",
      w: String = "w"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tot = weights.agg(sum(col(w)).as("__sw"))
    val base = weights.crossJoin(broadcast(tot))
      .withColumn("__b0", expr(s"(cast($k as bigint) * $w) DIV __sw"))
      .withColumn("__rem", expr(s"(cast($k as bigint) * $w) % __sw"))
    val spent = base.agg(sum(col("__b0")).as("__spent"))
    base.crossJoin(broadcast(spent))
      .withColumn("__rr", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__rem").desc, col(group).asc)))
      .withColumn("budget",
        (col("__b0") + when(col("__rr") <= lit(k.toLong) - col("__spent"), 1L)
          .otherwise(0L)).cast("long"))
      .select(col(group), col("budget"))
  }

  /** Per-group vocabulary under per-group budgets — [[buildVocab]]'s
    * global top-k replaced by one top-budget(g) per group, so a
    * low-resource language's tokens stop losing the global frequency
    * race to the dominant language (the p78 remediation). Emits
    * (group, token, n_occurrences, vocab_rank); the production vocab
    * is the DISTINCT token union (a token admitted by any group is
    * usable everywhere).
    *
    * Scale: one (group, token) aggregation with map-side partials,
    * then a per-group WindowGroupLimit-shaped rank against the
    * broadcast |groups|-row budget table — every group ranks in
    * parallel, no corpus-global sort.
    */
  def buildVocabPerGroup(docs: DataFrame, budgets: DataFrame,
      group: String = "lang", text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col(group),
        explode(split(trim(lower(col(text))), "\\s+")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col(group), col("token")).agg(count(lit(1)).as("n_occurrences"))
      .withColumn("vocab_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(group))
          .orderBy(col("n_occurrences").desc, col("token").asc)).cast("long"))
      .join(broadcast(budgets), Seq(group))
      .where(col("vocab_rank") <= col("budget"))
      .select(col(group), col("token"), col("n_occurrences"), col("vocab_rank"))
  }

  /** Encode each document against a [[buildVocab]] vocabulary and emit
    * a deterministic ORDER-SENSITIVE fingerprint instead of the raw id
    * array (the array is what a real pipeline writes; the fingerprint
    * is what a replay oracle can hash): per doc, n_tokens, n_oov
    * (tokens outside the vocab, id 0), and
    * ids_fp = Σ position·(id+1) — exact integer arithmetic, so any
    * id slip, OOV flip, or reorder moves the fingerprint.
    *
    * Shape: explode → broadcast vocab join → one doc-keyed aggregation
    * with map-side partials. No window, no per-doc array rebuild.
    */
  def encodeFingerprint(docs: DataFrame, vocab: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col(id),
        posexplode(split(trim(lower(col(text))), "\\s+")).as(Seq("pos", "token")))
      .where(col("token") =!= "")
    toks
      .join(broadcast(vocab.select(col("token"), col("token_id"))), Seq("token"), "left")
      .withColumn("__tid", coalesce(col("token_id"), lit(0L)))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__tid") === 0L, 1L).otherwise(0L)).as("n_oov"),
        sum((col("pos") + 1) * (col("__tid") + 1)).as("ids_fp"))
  }

  /** Top-k terms per document by TF-IDF.
    *
    * Plan shape at scale: tokens explode after a repartition on the
    * doc id (single-split corpora would otherwise fan out in one
    * task), term frequencies partial-aggregate map-side, the document
    * frequency table is vocabulary-sized and BROADCASTs back onto the
    * per-doc rows, and the only remaining shuffle is the per-doc top-k
    * window. `totalDocs` is one driver scalar (count), the same class
    * of metadata collect the correlation job's shape probe uses.
    *
    * Determinism: scores round to 9dp BEFORE ranking (ln differs in
    * the last ulp across engines; ranking the rounded score with a
    * term tiebreak keeps Spark and the SQL oracle identical), and the
    * output score rounds to 6dp.
    */
  def topTermsTfidf(docs: DataFrame, k: Int, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val tokens = docs
      .repartition(spark.sparkContext.defaultParallelism, col(id))
      .select(col(id), explode(split(trim(lower(col(text))), "\\s+")).as("term"))
      .where(col("term") =!= "")
    // tf feeds BOTH the df table and the scored rows — materialize it
    // once (eager, same AQE-reuse-race rationale as Dedup's minhash
    // checkpoint; same executor-loss recompute trade). The df
    // aggregation is per-term with map-side partials, NOT a window
    // over term partitions: stopword-grade hot terms would put one
    // term's whole posting list in a single window task, while the
    // aggregate + broadcast route has no skewed task anywhere.
    val tf = tokens.groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfTable = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.count()
    val scored = tf.join(broadcast(dfTable), Seq("term"))
      .withColumn("__s", round(col("tf") * log(lit(n.toDouble) / col("df")), 9))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("__s").desc, col("term").asc)
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .select(col(id), col("term"), col("tf"), col("df"),
        round(col("__s"), 6).as("tfidf"))
  }

  /** Okapi BM25 top-k retrieval — the ranking function behind
    * search-based data selection (and the scoring half of
    * importance-resampling curation): score every document against a
    * fixed bag of query terms, return the k best.
    *
    * Shape at 100 TB: the corpus is read once into (dl, postings)
    * where postings keep ONLY query terms — the shuffle after the
    * explode carries O(matching tokens), not the corpus; the df table
    * is query-term-bounded and broadcasts; N and avgdl are ONE scalar
    * aggregate broadcast back (the deliberate 1-row cross join, the
    * p51 pattern); the final cut is `orderBy.limit` — Spark plans
    * TakeOrderedAndProject (per-partition heaps + driver merge of k
    * rows), never a corpus range-exchange sort.
    *
    * Scores use the engine's integer micro-unit discipline: the
    * per-(doc, term) BM25 contribution quantizes to round(s·1e6) as a
    * BIGINT and per-document totals sum exactly — bit-identical on
    * any engine and any aggregation order, so the top-k cut (rounded
    * score desc, id asc) is deterministic cross-engine. IDF is the
    * Lucene form ln(1 + (N - df + ½)/(df + ½)), non-negative by
    * construction.
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = docs.sparkSession
    val qlit = array(queryTerms.map(lit): _*)
    // one corpus pass: per-doc length + query-term postings (the
    // single-split-parquet repartition discipline, as topTermsTfidf)
    val base = docs
      .repartition(spark.sparkContext.defaultParallelism, col(id))
      .select(col(id),
        filter(split(trim(lower(col(text))), "\\s+"), t => t =!= "").as("__tk"))
      .localCheckpoint(true) // read twice: corpus stats and postings
    val stats = base.agg(count(lit(1)).as("N"),
      avg(size(col("__tk")).cast("long")).as("avgdl"))
    val tf = base
      .select(col(id), size(col("__tk")).cast("long").as("dl"),
        explode(filter(col("__tk"), t => array_contains(qlit, t))).as("term"))
      .groupBy(col(id), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfTable = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("N") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val num = col("tf") * (lit(k1) + lit(1.0))
    val den = col("tf") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))
    tf.join(broadcast(dfTable), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__micro", round(idf * num / den * lit(1e6)).cast("long"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(col("__micro")) / lit(1e6), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(id).asc)
      .limit(k)
  }

  /** Overlapping sliding-window chunks of `size` characters advancing
    * by `stride` — the context-length preprocessing step of an LLM
    * training pipeline (documents larger than the model window become
    * overlapping windows; the final chunk is the remainder). Pure
    * per-row column math: `sequence` + `transform` + `posexplode`, no
    * shuffle, no UDF — the fan-out multiplies rows ~len/stride times,
    * so callers on single-split corpora should repartition first (the
    * same consideration as [[Dedup.shingleRows]]).
    *
    * Chunk count k is the smallest k with (k-1)*stride + size >= len
    * (1 for texts within one window); chunk i covers characters
    * [i*stride + 1, i*stride + size].
    */
  def chunkText(docs: DataFrame, size: Int, stride: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      s"need 1 <= stride <= size, got size=$size stride=$stride")
    val len = length(col(text)).cast("long")
    // Column `/` is true division (double) — cast back to long; the
    // numerator is non-negative in this branch so truncation = floor
    val k = when(len <= size, lit(1L))
      .otherwise(((len - size + stride - 1) / stride).cast("long") + 1L)
    docs.select(col(id),
        posexplode(transform(sequence(lit(0L), k - 1L),
          i => col(text).substr((i * stride + 1L).cast("int"), lit(size)))))
      .select(col(id), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk"), length(col("col")).cast("long").as("chunk_len"))
  }

  /** Concat-then-split sequence packing — the GPT-style batching step:
    * documents concatenate in `order` within each shard and the token
    * stream cuts into fixed `seqLen` sequences, documents spanning cut
    * points. Output: one row per (shard, sequence, document) with the
    * document's token count inside that sequence.
    *
    * The running token offset is a window over the SHARD, not the
    * corpus: a global prefix-sum would serialize into one partition,
    * while per-shard packing (shard = language, source, or a hash
    * bucket) keeps every partition independent — the standard
    * distributed packing layout, losing only cross-shard packing
    * density (bounded by one partial sequence per shard).
    */
  def packSequences(docs: DataFrame, seqLen: Int, shard: Seq[String],
      order: String, text: String = "text"): DataFrame = {
    require(seqLen >= 1, s"seqLen must be positive, got $seqLen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shard.map(col): _*).orderBy(col(order).asc)
    val L = lit(seqLen.toLong)
    val counted = docs
      .withColumn("__n", tokenCountWs(col(text)).cast("long"))
      .where(col("__n") > 0) // zero-token docs occupy no sequence
      .withColumn("__start", sum(col("__n")).over(w) - col("__n"))
    counted
      .withColumn("seq_id", explode(sequence(
        (col("__start") / L).cast("long"),
        ((col("__start") + col("__n") - 1L) / L).cast("long"))))
      .select((shard.map(col) :+ col("seq_id") :+ col(order) :+
        (least(col("__start") + col("__n"), (col("seq_id") + 1L) * L) -
          greatest(col("__start"), col("seq_id") * L)).cast("long")
          .as("tokens_in_seq")): _*)
  }

  /** Polynomial rolling-hash fingerprint over characters:
    * fold(acc * 131 + codepoint) mod 1e9+7 — exact integer arithmetic,
    * identical in the SQL oracle via list_reduce.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 131L + c) % 1000000007L)

  def withFingerprint(docs: DataFrame, text: String = "text"): DataFrame =
    docs.withColumn("fingerprint", fingerprint(col(text)))

  /** Word n-grams: whitespace tokens of the lowercased text, n
    * consecutive tokens joined by one space; texts with fewer than n
    * tokens have none. `distinctGrams` controls multiplicity (overlap
    * ops want the SET, repetition scoring wants duplicates kept).
    */
  private def wordNgramArray(text: Column, n: Int, distinctGrams: Boolean): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val grams = transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    when(trim(text) === "" || size(toks) < n, array().cast("array<string>"))
      .otherwise(if (distinctGrams) array_distinct(grams) else grams)
  }

  /** Benchmark decontamination — the train/test overlap guard a
    * pretraining pipeline runs before training: corpus documents
    * sharing >= `minShared` distinct word n-grams with a benchmark
    * document are flagged (eval items that leaked into the training
    * corpus inflate downstream scores).
    *
    * Scale shape: the benchmark is TINY next to the corpus (thousands
    * of eval items vs billions of docs), so the benchmark n-gram set
    * BROADCASTS and the corpus side streams map-side through the hash
    * join; the per-(doc, bench) counts partial-aggregate. The only
    * corpus-sized movements are the pre-explode repartition (spreads
    * single-split corpora, same rationale as [[Dedup.shingleRows]])
    * and the final doc-keyed aggregation — never an n-gram-keyed
    * corpus shuffle.
    */
  def contaminationPairs(corpus: DataFrame, benchmark: DataFrame, n: Int,
      minShared: Long, id: String = "doc_id", text: String = "text",
      benchId: String = "bench_id"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val c = corpus
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism, col(id))
      .select(col(id), explode(wordNgramArray(col(text), n, distinctGrams = true)).as("__ng"))
    val b = benchmark
      .select(col(benchId), explode(wordNgramArray(col(text), n, distinctGrams = true)).as("__ng"))
    // both sides are per-doc DISTINCT n-grams, so the join-match count
    // IS the distinct shared-n-gram count
    c.join(broadcast(b), Seq("__ng"))
      .groupBy(col(id), col(benchId))
      .agg(count(lit(1)).as("shared_ngrams"))
      .where(col("shared_ngrams") >= minShared)
  }

  /** Bloom-prefiltered decontamination — [[contaminationPairs]]'s
    * 100 TB shape when the benchmark side outgrows a broadcast SET.
    *
    * [[contaminationPairs]] broadcasts the benchmark's exact n-gram
    * table; at ~10^9 benchmark n-grams that broadcast is impossible
    * and the verify join degrades to shuffling EVERY corpus n-gram.
    * Here the benchmark n-grams are first folded into a fixed-size
    * Bloom filter (a distributed aggregate — the driver only ever
    * holds the merged bitmap, `-ln(fpp)·n/ln²2` bits ≈ 1.2 GB for 10^9
    * grams at 1%), the bitmap is broadcast, and corpus n-grams are
    * probed per-row BEFORE the exact verify join — so the join's probe
    * side carries only true hits plus the fpp sliver, not the corpus.
    *
    * Exactness is preserved: a Bloom filter has NO false negatives, so
    * every actually-shared n-gram survives the prefilter and the
    * downstream verify join emits byte-identical output to
    * [[contaminationPairs]] — the oracle is literally p26's. False
    * positives only cost wasted probe rows, discarded by the join.
    *
    * The probe is a deserialized predicate (no codegen) by necessity —
    * Spark exposes `BloomFilterMightContain` only to its runtime-
    * filter rewrite — but it runs on a column the scan already
    * materialized and shears the shuffle after it; BloomSpec pins both
    * the output equality and the prefilter's measured selectivity.
    */
  def contaminationPairsBloom(corpus: DataFrame, benchmark: DataFrame, n: Int,
      minShared: Long, expectedGrams: Long = 1L << 20, fpp: Double = 0.01,
      id: String = "doc_id", text: String = "text",
      benchId: String = "bench_id"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val spark = corpus.sparkSession
    val benchGrams = benchmark
      .select(explode(wordNgramArray(col(text), n, distinctGrams = true)).as("__ng"))
    val bf = benchGrams.stat.bloomFilter("__ng", expectedGrams, fpp)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf { s: String => s != null && bfB.value.mightContainString(s) }
    val c = corpus
      .repartition(spark.sparkContext.defaultParallelism, col(id))
      .select(col(id), explode(wordNgramArray(col(text), n, distinctGrams = true)).as("__ng"))
      .where(mightContain(col("__ng")))
    val b = benchmark
      .select(col(benchId), explode(wordNgramArray(col(text), n, distinctGrams = true)).as("__ng"))
    // the verify join deliberately does NOT force broadcast(): at the
    // scale where this variant matters the bench table shuffles, and
    // the Bloom gate above is what keeps the corpus side of that
    // shuffle proportional to the contamination, not the corpus
    c.join(b, Seq("__ng"))
      .groupBy(col(id), col(benchId))
      .agg(count(lit(1)).as("shared_ngrams"))
      .where(col("shared_ngrams") >= minShared)
  }

  /** Intra-document repetition (a Gopher-style quality signal): the
    * fraction of word n-grams that are repeats of an earlier n-gram in
    * the same document. Boilerplate/spam text scores high; natural
    * prose low. Pure per-row column math, no shuffle.
    *
    * The TOTAL n-gram count is arithmetic (tokens - n + 1) — only the
    * DISTINCT count needs the materialized gram array, so the
    * string-building transform runs exactly once per row (building it
    * per derived column measured 4x slower at sf0.1).
    */
  def withRepetitionColumns(docs: DataFrame, n: Int = 2,
      text: String = "text"): DataFrame = {
    // document tables often arrive as ONE split (small parquet files);
    // the n-gram distinct is the heaviest per-row expression in the
    // text family, so spread it across the cluster first (same
    // rationale as Dedup.shingleRows — at real corpus scale the scan
    // has enough splits and AQE coalesces the no-op exchange)
    val spreadDocs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    val toks = split(trim(lower(col(text))), "\\s+")
    val total = when(trim(col(text)) === "", lit(0L))
      .otherwise(greatest(size(toks) - (n - 1), lit(0)).cast("long"))
    val nDistinct = size(array_distinct(wordNgramArray(col(text), n, distinctGrams = false)))
      .cast("long")
    spreadDocs
      .withColumn("n_ngrams", total)
      .withColumn("dup_ngram_ratio",
        when(col("n_ngrams") > 0,
          (col("n_ngrams") - nDistinct).cast("double") / col("n_ngrams").cast("double"))
          .otherwise(0.0))
  }

  /** PII detection + redaction — the scrubbing pass of a training-data
    * pipeline: count email/phone matches and rewrite them to
    * placeholder tags. Patterns stay in the RE2-compatible subset
    * (char classes, bounded quantifiers, word boundaries — no
    * lookaround/backrefs) so Spark's Java regex and the DuckDB oracle
    * agree match-for-match. Per-row codegen column math, no shuffle.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  def withPiiColumns(docs: DataFrame, text: String = "text"): DataFrame =
    // regex passes per row — spread single-split corpora first
    // (see withRepetitionColumns)
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      // redaction order: emails first, then phones over the already
      // email-redacted text. The COUNTS follow the same cascade — the
      // phone count is taken on the email-redacted text — so
      // n_emails/n_phones always equal the <EMAIL>/<PHONE> placeholder
      // occurrences in `redacted` (a phone-shaped substring inside an
      // email, e.g. 555-123-4567@relay.example.com, counts as the
      // email that swallowed it, not as both).
      .withColumn("n_emails",
        size(regexp_extract_all(col(text), lit(EmailPattern), lit(0))).cast("long"))
      .withColumn("__email_redacted",
        regexp_replace(col(text), EmailPattern, "<EMAIL>"))
      .withColumn("n_phones",
        size(regexp_extract_all(col("__email_redacted"), lit(PhonePattern), lit(0))).cast("long"))
      .withColumn("redacted",
        regexp_replace(col("__email_redacted"), PhonePattern, "<PHONE>"))
      .drop("__email_redacted")

  /** Per-domain boilerplate LINE removal (the CCNet/RefinedWeb line-dedup
    * signal): a line occurring in >= `minDocs` DISTINCT documents of the
    * same `src` (nav menus, cookie banners, footers) is boilerplate;
    * every occurrence is dropped and each document is reassembled from
    * its surviving lines in original order. Complements the
    * whole-document dedup family ([[Dedup]]): those drop COPIES of a
    * document, this drops the template furniture WITHIN otherwise-unique
    * documents.
    *
    * Output: (id, src, text_clean, n_kept, n_dropped) — one row per
    * input document, including documents whose every line dropped
    * (empty text_clean via the final left join).
    *
    * 100 TB: one explode -> (src, line-digest) distinct-doc count; the
    * boilerplate set keeps only digests over the threshold — the
    * heavy-hitter tail, bounded by total_lines/minDocs — and is
    * anti-joined back on (src, digest), so no full-line strings ride
    * the wide shuffles. Reassembly aggregates by document id (the
    * explode's own key, so AQE coalesces the two same-key exchanges).
    * An identical-LINE flood is the common case by design here (that is
    * what boilerplate is) and stays linear: lines only group and count,
    * never self-join.
    */
  def dropBoilerplateLines(docs: DataFrame, minDocs: Int,
      id: String = "doc_id", src: String = "source",
      text: String = "text"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // -1 keeps trailing empty lines so n_kept + n_dropped = line count
    val lines = docs
      .select(col(id), col(src), posexplode(split(col(text), "\n", -1)))
      .withColumnRenamed("pos", "idx")
      .withColumnRenamed("col", "line")
      .withColumn("digest", md5(col("line")))
    val boiler = lines.groupBy(col(src), col("digest"))
      .agg(countDistinct(col(id)).as("df"))
      .where(col("df") >= minDocs)
      .select(col(src), col("digest"))
    val kept = lines.join(boiler, Seq(src, "digest"), "left_anti")
    val rebuilt = kept.groupBy(col(id)).agg(
      array_join(
        transform(array_sort(collect_list(struct(col("idx"), col("line")))),
          x => x.getField("line")), "\n").as("text_clean"),
      count(lit(1)).as("n_kept"))
    docs
      .select(col(id), col(src),
        size(split(col(text), "\n", -1)).cast("long").as("__n_lines"))
      .join(rebuilt, Seq(id), "left")
      .select(col(id), col(src),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
