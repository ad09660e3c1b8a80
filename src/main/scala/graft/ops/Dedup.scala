package graft.ops

import graft.functions.AsciiLowerFn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Document deduplication operators for large-scale training-data
  * pipelines: exact, character-n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * All are pure `DataFrame => DataFrame` and deterministic (md5-derived
  * hashing, see [[Hashing]]) so each has a DuckDB oracle.
  *
  * Scale design:
  *  - exact: one hash-groupBy shuffle on the digest.
  *  - n-gram Jaccard: inverted-index self-join on shingles — exact but
  *    quadratic in per-shingle document frequency; the correct tool up
  *    to moderate df. At 100 TB use [[minhashCandidates]] first: LSH
  *    banding bounds the join fan-out by bucket, and only candidates
  *    pay the exact-verify cost.
  *  - SimHash: 4-block pigeonhole blocking (hamming <= 3 implies one
  *    of four 15-bit blocks equal) turns the all-pairs search into
  *    four equi-joins.
  */
object Dedup {
  import Hashing._

  /** Exact duplicate groups by content digest: keep lowest id.
    * (hash-groupBy; at scale this is one shuffle on md5.)
    */
  def exactDupGroups(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.groupBy(md5(col(text)).as("text_md5"))
      .agg(count(lit(1)).as("n_copies"), min(col(id)).as("keep_id"))
      .where(col("n_copies") > 1)

  /** Canonical text-normalization key: strip non-alphanumerics to
    * single spaces FIRST (so lowercasing only ever sees ASCII — Unicode
    * case-folding is engine-specific and would break cross-engine
    * dedup-key parity), then lowercase and trim. Case, punctuation and
    * whitespace differences collapse; word content is preserved.
    */
  def normalizedText(text: Column): Column =
    trim(lower(regexp_replace(text, "[^a-zA-Z0-9]+", " ")))

  /** Exact dedup after text normalization — catches the re-encoded/
    * re-punctuated near-copies exact md5 misses, at exact-dedup cost
    * (one hash shuffle on the normalized digest; the normalization is
    * per-row codegen'd column math).
    */
  def normalizedDupGroups(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame =
    docs.groupBy(md5(normalizedText(col(text))).as("norm_md5"))
      .agg(count(lit(1)).as("n_copies"), min(col(id)).as("keep_id"))
      .where(col("n_copies") > 1)

  /** Representative SELECTION for dedup groups — the policy half the
    * keep-smallest-id ops fix by fiat: when a normalized-text group
    * holds several renditions of one document (re-cased, re-punctuated,
    * boilerplate-suffixed crawls of the same page), a curation pipeline
    * wants to KEEP THE BEST rendition, not the lowest id. Scores each
    * doc with the p8 quality composite (6 dp-rounded so the ranking key
    * is engine-identical), groups by the normalized digest, and picks
    * the max-(quality, lowest-id-on-tie) member via ONE max-of-struct
    * aggregation — the d5 shape: no per-group window sort, no
    * join-back, map-side partial max does most of the work.
    *
    * Output: one row per group — norm_md5, n_copies, keep_id,
    * best_quality. Singleton groups report themselves (keep_id = the
    * doc), so the output IS the kept-corpus directory.
    */
  def dedupKeepBest(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val scored = TextStats.withQualityColumns(docs, text)
      .withColumn("__q", round(col("quality_score"), 6))
    scored
      .groupBy(md5(normalizedText(col(text))).as("norm_md5"))
      .agg(count(lit(1)).as("n_copies"),
        // lexicographic struct max: highest quality, then highest
        // negated id = LOWEST id on quality ties — deterministic
        max(struct(col("__q").as("q"), (-col(id)).as("nid"))).as("__best"))
      .select(col("norm_md5"), col("n_copies"),
        (-col("__best.nid")).cast("long").as("keep_id"),
        col("__best.q").as("best_quality"))
  }

  /** Exact dedup after Unicode NFC canonical composition — catches the
    * copies whose only difference is the encoder that produced them
    * (precomposed U+00E9 vs decomposed e+U+0301 and every other
    * canonical-equivalence pair), which byte-level md5 dedup misses.
    * Same cost shape as [[exactDupGroups]]: one codegen'd per-row
    * normalization ([[graft.functions.NfcNormalizeFn]], allocation-free
    * for already-composed text) + one hash shuffle on the digest.
    */
  def unicodeDupGroups(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame =
    docs.groupBy(md5(graft.functions.NfcNormalizeFn(col(text))).as("nfc_md5"))
      .agg(count(lit(1)).as("n_copies"), min(col(id)).as("keep_id"))
      .where(col("n_copies") > 1)

  /** PARAGRAPH-level exact dedup with document reassembly — the
    * C4/Dolma discipline the whole-document ops above cannot express:
    * web corpora repeat navigation chrome, license blocks and quoted
    * passages across millions of otherwise-distinct pages, so the
    * dedup unit is the paragraph and the OUTPUT is the cleaned corpus
    * (each doc rebuilt from its surviving paragraphs), not a dup
    * report. Policy is global first-occurrence-wins: a paragraph
    * survives only at its lexicographically smallest (id, position)
    * across the whole corpus — repeats WITHIN a document dedup too.
    *
    * Emits one row per input doc: (id, n_paras, n_kept, kept_chars,
    * kept_text) where kept_text is the surviving paragraphs re-joined
    * in original order by `sep` (empty string when nothing survives —
    * the downstream length filter's problem, kept visible). Callers
    * wanting only stats fingerprint/drop kept_text.
    *
    * Scale shape: posexplode is per-row; the keeper assignment is ONE
    * hash-groupBy shuffle on the paragraph digest (min-struct
    * aggregation with map-side partials — never pair enumeration, so
    * a boilerplate paragraph repeated 1e9 times costs a count, not a
    * join fan-out); survivors join back on the digest (co-partitioned
    * by the groupBy's own exchange) and reassembly is one groupBy on
    * the doc id with per-doc-bounded collect_list. Three shuffles
    * total, all keyed, no window over the corpus.
    *
    * `sep` is treated as a LITERAL separator (regex-quoted for the
    * split) — the \n\n convention; the oracle replays with the same
    * literal split.
    */
  def paragraphDedup(docs: DataFrame, sep: String = "\n\n",
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val paras = docs
      .select(col(id), posexplode(
        split(col(text), java.util.regex.Pattern.quote(sep), -1)))
      .select(col(id), (col("pos") + 1L).as("idx"), col("col").as("para"))
      .withColumn("k", md5(col("para")))
    val keepers = paras.groupBy(col("k"))
      .agg(min(struct(col(id).as("kid"), col("idx").as("kidx"))).as("kp"))
    val kept = paras.join(keepers, Seq("k"))
      .where(col(id) === col("kp.kid") && col("idx") === col("kp.kidx"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_kept"),
        sum(length(col("para"))).as("kept_chars"),
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("para")))),
          x => x("para")), sep).as("kept_text"))
    paras.groupBy(col(id)).agg(count(lit(1)).as("n_paras"))
      .join(kept, Seq(id), "left")
      .select(col(id), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_chars"), lit(0L)).as("kept_chars"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  private def shingleArray(text: Column, n: Int): Column =
    // texts shorter than n have NO shingles: without the guard,
    // sequence(1, 0) yields [1, 0] (Spark auto-steps -1 when start >
    // stop) and emits spurious whole-text/empty shingles the oracle
    // (DuckDB range(), empty when stop < start) never produces
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))

  /** (id, shingle) exploded distinct character n-grams.
    *
    * The input is repartitioned by id first: document tables often
    * arrive as few (or one) input splits, and the explode multiplies
    * rows ~|text| times — without the repartition the whole fan-out
    * runs in the scan's task count (measured: single-threaded at
    * sf0.1). At cluster scale this is the shuffle that spreads docs
    * across executors before the heavy per-shingle hashing.
    */
  def shingleRows(docs: DataFrame, n: Int, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, col(id))
      .select(col(id), explode(shingleArray(col(text), n)).as("shingle"))

  /** Exact n-gram Jaccard similarity pairs >= tau — full inverted
    * index, quadratic in per-shingle document frequency. Retained as
    * the independent formulation that pins [[ngramJaccardPairsPrefix]]
    * in OpsSpec; the prefix-filtered plan is the production path.
    */
  private[ops] def ngramJaccardPairsFull(docs: DataFrame, n: Int, tau: Double,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val sh = shingleRows(docs, n, id, text)
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    val a = sh.toDF("id_a", "shingle")
    val b = sh.toDF("id_b", "shingle")
    val shared = a.join(b, a("shingle") === b("shingle") && a("id_a") < b("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
    jaccardGate(shared, sizes, tau)
  }

  private def jaccardGate(shared: DataFrame, sizes: DataFrame, tau: Double): DataFrame =
    shared
      .join(sizes.toDF("id_a", "sz_a"), "id_a")
      .join(sizes.toDF("id_b", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("sz_a") + col("sz_b") - col("shared")).cast("double"))
      .where(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("shared"), col("sz_a"), col("sz_b"),
        col("jaccard"))

  /** Exact n-gram Jaccard pairs >= tau via PREFIX FILTERING (Bayardo et
    * al. "Scaling Up All Pairs Similarity Search" / SSJoin): order each
    * document's shingles by global document frequency (rarest first —
    * tie-broken by shingle value so the order is total and
    * deterministic) and index only the first |S| − ceil(tau·|S|) + 1 of
    * them. Two documents with J >= tau MUST share a prefix shingle, so
    * candidate generation joins ONLY on prefix rows — the inverted
    * index's fan-out collapses from every co-occurring pair (quadratic
    * in shingle document frequency; stopword-grade shingles dominate)
    * to pairs sharing a RARE shingle. A length filter (|S_b| >=
    * tau·|S_a|) prunes further before verification; verification joins
    * the candidate pairs back onto the full shingle lists for exact
    * intersection counts, so the output is EXACTLY the quadratic
    * plan's — same oracle, pinned by OpsSpec.
    *
    * Scale shape: shingle scan (+df aggregate, map-side partials), one
    * per-doc rank window (bounded by document length), the candidate
    * equi-join on prefix shingles, and two verification joins bounded
    * by candidate count x document shingles.
    */
  def ngramJaccardPairsPrefix(docs: DataFrame, n: Int, tau: Double,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    // one shingle materialization feeds df counts, the prefix rank, and
    // both verification sides (same AQE-race rationale as minhash)
    val sh = shingleRows(docs, n, id, text).localCheckpoint(true)
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("__df").asc, col("shingle").asc)
    val prefix = sh.join(dfreq, "shingle")
      .withColumn("__pos", row_number().over(w))
      .join(sizes, Seq(id.toString))
      .where(col("__pos") <= col("sz") - ceil(col("sz") * tau) + 1L)
      .select(col(id), col("shingle"), col("sz"))
    val pa = prefix.toDF("id_a", "shingle", "sz_a")
    val pb = prefix.toDF("id_b", "shingle", "sz_b")
    val cand = pa.join(pb, pa("shingle") === pb("shingle") && pa("id_a") < pb("id_b"))
      // length filter: J >= tau bounds the size ratio by tau
      .where(col("sz_b") >= ceil(col("sz_a") * tau) &&
        col("sz_a") >= ceil(col("sz_b") * tau))
      .select("id_a", "id_b").distinct()
    // exact verification WITHOUT the candidate×shingle row expand:
    // each doc's (already-distinct) shingles collect into ONE array
    // row, candidates attach both docs' arrays by id equi-join, and
    // the intersection is a per-row size(array_intersect) — the same
    // exact integer as the expand-join-count it replaces (both inputs
    // are distinct sets, and pairs with an empty intersection die at
    // the tau > 0 gate exactly as the inner-join form dropped them).
    // The previous form fanned every candidate out |S_a| rows through
    // a shuffle join + semi-join + re-aggregation — three exchanges
    // of Σ_cand |S_a| rows for what is per-pair column math; measured
    // on the p86 audit panel the verify stage dominated the suite's
    // most expensive query (~3-4 s of 32-task compute). Set rows are
    // document-bounded (one array per doc, the bytes the expand
    // carried per candidate anyway); the explicit user-numbered
    // repartition still keeps the CPU-heavy intersection stage wide
    // (AQE preserves it; by size the stage is a few KB — the p27
    // trap).
    val sets = sh.groupBy(col(id)).agg(collect_list(col("shingle")).as("__set"))
    val shared = cand
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("id_a"), col("id_b"))
      .join(sets.toDF("id_a", "__set_a"), "id_a")
      .join(sets.toDF("id_b", "__set_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("__set_a"), col("__set_b")))
          .cast("long").as("shared"))
    jaccardGate(shared, sizes, tau)
  }

  /** Exact n-gram Jaccard pairs — the production (prefix-filtered)
    * plan; see [[ngramJaccardPairsPrefix]].
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, tau: Double,
      id: String = "doc_id", text: String = "text"): DataFrame =
    ngramJaccardPairsPrefix(docs, n, tau, id, text)

  /** MinHash signatures: (id, hash_index i, minhash value). */
  def minhashSignatures(docs: DataFrame, n: Int, numHashes: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = shingleRows(docs, n, id, text)
      .withColumn("x", hex64(col("shingle")))
    val params = hashParams(numHashes).toDF("i", "a", "b")
    sh.crossJoin(broadcast(params))
      .groupBy(col(id), col("i"))
      .agg(min(universal(col("x"), col("a"), col("b"))).as("mh"))
  }

  /** Compact signature table: one row per doc, `sig` = array of
    * numHashes minhash values ordered by hash index.
    *
    * One aggregation computes ALL hash functions as parallel `min`
    * aggregate columns over the shingle rows — no numHashes-way row
    * multiplication, no (id, i) shuffle; the per-hash work happens in
    * the map-side partial aggregate and only |docs| rows reach the
    * exchange. (The row-multiplying [[minhashSignatures]] shape
    * measured ~5x slower at sf0.1.)
    */
  def minhashSignatureArrays(docs: DataFrame, n: Int, numHashes: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val sh = shingleRows(docs, n, id, text)
      .withColumn("x", hex64(col("shingle")) % P31)
    val mins = hashParams(numHashes).map { case (i, a, b) =>
      min((col("x") * a + b) % P31).as(s"mh_$i")
    }
    sh.groupBy(col(id))
      .agg(mins.head, mins.tail: _*)
      .select(col(id),
        array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("sig"))
  }

  /** LSH candidate pairs: documents sharing at least one full band of
    * `rowsPerBand` consecutive minhash components.
    */
  def minhashCandidates(sig: DataFrame, rowsPerBand: Int,
      id: String = "doc_id"): DataFrame = {
    val banded = sig
      .withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .groupBy(col(id), col("band"))
      .agg(concat_ws(",",
        sort_array(collect_list(concat_ws(":", col("i"), col("mh"))))).as("band_sig"))
    val a = banded.toDF("id_a", "band", "band_sig")
    val b = banded.toDF("id_b", "band", "band_sig")
    a.join(b, Seq("band", "band_sig"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Estimated Jaccard for candidate pairs = fraction of equal
    * signature components.
    */
  def minhashEstimate(sig: DataFrame, candidates: DataFrame,
      id: String = "doc_id"): DataFrame = {
    val sa = sig.toDF("id_a", "i", "mh_a")
    val sb = sig.toDF("id_b", "i", "mh_b")
    candidates
      .join(sa, "id_a").join(sb, Seq("id_b", "i"))
      .groupBy("id_a", "id_b")
      .agg((sum(when(col("mh_a") === col("mh_b"), 1.0).otherwise(0.0)) /
        count(lit(1))).as("est_jaccard"))
  }

  /** MinHash+LSH near-duplicate pairs with estimated Jaccard >= tau.
    *
    * Plan shape: ONE pass computes per-doc signature arrays (cached —
    * |docs| x numHashes longs); bands explode from the array; candidate
    * pairs join back to the arrays; the estimate is a zip_with over two
    * 16-element arrays. Without the cache Spark would recompute the
    * full shingle scan for each of the three references (measured 649s
    * -> the restructure + cache brings it to seconds at sf0.1).
    *
    * HOT-BUCKET GUARD (the 100 TB skew fix): an identical-doc flood —
    * 10^6 boilerplate copies, routine in web corpora — lands every copy
    * in the SAME bucket on EVERY band, making the candidate self-join
    * quadratic in the flood size inside one task. Documents with
    * identical full signatures are therefore collapsed to one
    * representative (min id) BEFORE pairing; each group re-enters the
    * output as rep->member star edges (est_jaccard 1.0 — the signatures
    * are identical by construction). Pair semantics under the guard:
    * within/between identical-signature groups, member pairs are
    * REPRESENTED by their star + rep-pair edges rather than enumerated
    * — the duplicate components (and the keep-min decision built on
    * them, see [[ConnectedComponents]]) are provably unchanged, and on
    * a corpus with no repeated signatures the output is identical to
    * the unguarded plan (pinned by HotBucketSpec against
    * [[minhashDupPairsUnguarded]]).
    */
  /** Cross-split leakage audit — the eval-integrity check every
    * train/test split needs and almost no pipeline runs: a near-dup
    * PAIR that straddles splits (its twin in train, itself in test)
    * silently inflates every benchmark number trained on that split.
    * Composes the [[minhashDupPairs]] candidate machinery with
    * [[Sampling.splitAssign]]'s deterministic hash splits and keeps
    * only pairs whose endpoints land in DIFFERENT splits — the audit
    * detail rows a curation run must drive to zero (drop either
    * endpoint, or re-split by near-dup component instead of by doc:
    * assign [[ConnectedComponents]] components, not documents, to
    * splits).
    *
    * Scale shape = p3's (banded candidates, signature-collapse) plus
    * two broadcast-sized split lookups riding the id keys — the split
    * column is pure per-row hash math, so the joins attach it without
    * any extra corpus scan or shuffle beyond p3's own.
    */
  def splitLeakagePairs(docs: DataFrame, splits: Seq[(String, Int)],
      n: Int = 8, numHashes: Int = 16, rowsPerBand: Int = 4,
      tau: Double = 0.5,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val sp = Sampling.splitAssign(docs, col(id), splits)
      .select(col(id), col("split"))
    minhashDupPairs(docs, n, numHashes, rowsPerBand, tau, id, text)
      .join(sp.select(col(id).as("id_a"), col("split").as("split_a")), Seq("id_a"))
      .join(sp.select(col(id).as("id_b"), col("split").as("split_b")), Seq("id_b"))
      .where(col("split_a") =!= col("split_b"))
      .select(col("id_a"), col("id_b"), col("split_a"), col("split_b"),
        col("est_jaccard"))
  }

  def minhashDupPairs(docs: DataFrame, n: Int = 8, numHashes: Int = 16,
      rowsPerBand: Int = 4, tau: Double = 0.5,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must divide into bands of rowsPerBand ($rowsPerBand) — " +
        "trailing components would silently never form a band")
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    // localCheckpoint(eager): plain cache() is lazy, and AQE submits the
    // four downstream references as CONCURRENT stages — each would race
    // to compute the uncached lineage (measured: 4 parallel ~230s
    // stages doing identical work). Eager materialization runs the
    // expensive scan exactly once.
    // Cluster trade: localCheckpoint TRUNCATES lineage and stores the
    // blocks on executors only — losing an executor mid-query fails the
    // job (no recompute path) and it must be resubmitted. Acceptable
    // here because the checkpoint lives for one query, not a pipeline;
    // on a preemptible/spot cluster swap in df.checkpoint() (reliable,
    // HDFS-backed) at the cost of a write.
    val sigArr = minhashSignatureArrays(docs, n, numHashes, id, text)
      .localCheckpoint(true)
    // collapse identical signatures: one digest-keyed aggregation (the
    // same shuffle shape as exact dedup); checkpointed because stars,
    // the banded frame and both estimate joins all read it
    val keyed = sigArr.withColumn("__sig_key", concat_ws(",", col("sig")))
    val grp = keyed.groupBy(col("__sig_key"))
      .agg(min(col(id)).as("__rep"), first(col("sig")).as("sig"))
      .localCheckpoint(true)
    val stars = keyed.join(grp.select(col("__sig_key"), col("__rep")), "__sig_key")
      .where(col(id) =!= col("__rep"))
      .select(col("__rep").as("id_a"), col(id).as("id_b"),
        lit(1.0).as("est_jaccard"))
    val reps = grp.select(col("__rep").as(id), col("sig"))
    val nBands = numHashes / rowsPerBand
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = (0 until nBands).toDF("band")
    val banded = reps.crossJoin(broadcast(bands))
      .select(col(id), col("band"),
        concat_ws(",", slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))
          .cast("array<string>")).as("band_sig"))
    val a = banded.toDF("id_a", "band", "band_sig")
    val b = banded.toDF("id_b", "band", "band_sig")
    val cand = a.join(b, Seq("band", "band_sig"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val repPairs = cand
      .join(reps.toDF("id_a", "sig_a"), "id_a")
      .join(reps.toDF("id_b", "sig_b"), "id_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1.0).otherwise(0.0)), lit(0.0), _ + _) /
          size(col("sig_a")).cast("double"))
      .where(col("est_jaccard") >= tau)
      .select("id_a", "id_b", "est_jaccard")
    // stars carry est 1.0 >= tau (tau <= 1 by the require above)
    repPairs.unionByName(stars)
  }

  /** INCREMENTAL near-dup detection: a NEW batch checked against an
    * EXISTING corpus whose signatures are already materialized — the
    * production shape, where the lake's signature table is persisted
    * state and a daily drop must not re-shingle petabytes.
    *
    * `corpusSig` is (id, sig) as produced by
    * [[minhashSignatureArrays]] (write it once, read it here); only
    * the BATCH pays shingling. Output contract, spec-pinned as a
    * differential: identical to
    * `minhashDupPairs(corpus ∪ batch)` restricted to pairs touching
    * the batch — same hot-bucket guard (identical signatures collapse
    * before banding; batch copies of corpus pages surface as
    * rep→member star edges), same tau gate, same estimates.
    *
    * Cost: shingle(batch) + one signature-collapse shuffle over
    * |corpus|+|batch| SIGNATURE rows (16 longs each, not documents) +
    * a band join whose probe side is batch-only — the corpus never
    * re-shingles and never self-joins.
    */
  def minhashDupPairsIncremental(corpusSig: DataFrame, batch: DataFrame,
      n: Int = 8, numHashes: Int = 16, rowsPerBand: Int = 4,
      tau: Double = 0.5, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must divide into bands of rowsPerBand ($rowsPerBand)")
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    val batchSig = minhashSignatureArrays(batch, n, numHashes, id, text)
    val batchIds = batchSig.select(col(id).as("__bid")).distinct()
      .localCheckpoint(true)
    val allSig = corpusSig.select(col(id), col("sig")).unionByName(batchSig)
      .localCheckpoint(true)
    val keyed = allSig.withColumn("__sig_key", concat_ws(",", col("sig")))
    val grp = keyed.groupBy(col("__sig_key"))
      .agg(min(col(id)).as("__rep"), first(col("sig")).as("sig"))
      .localCheckpoint(true)
    // star edges, restricted to those TOUCHING the batch (a
    // corpus-internal duplicate group is yesterday's news). The OR
    // membership test runs as TWO hash semi-joins + distinct — an OR
    // join condition would degrade to a nested-loop join
    val stars0 = keyed.join(grp.select(col("__sig_key"), col("__rep")), "__sig_key")
      .where(col(id) =!= col("__rep"))
      .select(col("__rep").as("id_a"), col(id).as("id_b"),
        lit(1.0).as("est_jaccard"))
    val stars = stars0
      .join(batchIds.withColumnRenamed("__bid", "id_a"), Seq("id_a"), "left_semi")
      .unionByName(stars0
        .join(batchIds.withColumnRenamed("__bid", "id_b"), Seq("id_b"), "left_semi"))
      .distinct()
    val reps = grp.select(col("__rep").as(id), col("sig"))
    def bandedOf(s: DataFrame): DataFrame = {
      val spark = s.sparkSession
      import spark.implicits._
      val bands = (0 until numHashes / rowsPerBand).toDF("band")
      s.crossJoin(broadcast(bands))
        .select(col(id), col("band"),
          concat_ws(",", slice(col("sig"), col("band") * rowsPerBand + 1,
            lit(rowsPerBand)).cast("array<string>")).as("band_sig"))
    }
    // probe side: only reps that ARE batch documents — the corpus
    // side never self-joins, so existing corpus-internal near-dups
    // are neither recomputed nor re-reported
    val repBatch = reps.join(batchIds, col(id) === col("__bid"), "left_semi")
    val a = bandedOf(repBatch).toDF("id_a", "band", "band_sig")
    val b = bandedOf(reps).toDF("id_b", "band", "band_sig")
    val cand = a.join(b, Seq("band", "band_sig"))
      .where(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
    val repPairs = cand
      .join(reps.toDF("id_a", "sig_a"), "id_a")
      .join(reps.toDF("id_b", "sig_b"), "id_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1.0).otherwise(0.0)), lit(0.0), _ + _) /
          size(col("sig_a")).cast("double"))
      .where(col("est_jaccard") >= tau)
      .select("id_a", "id_b", "est_jaccard")
    repPairs.unionByName(stars)
  }

  /** The UNGUARDED formulation — candidate join over every document,
    * no signature collapse. Quadratic in the largest identical-
    * signature group, so never the production path; retained as the
    * independent formulation HotBucketSpec pins [[minhashDupPairs]]
    * against on repeated-signature-free corpora (the
    * [[ngramJaccardPairsFull]] pattern).
    */
  private[ops] def minhashDupPairsUnguarded(docs: DataFrame, n: Int = 8,
      numHashes: Int = 16, rowsPerBand: Int = 4, tau: Double = 0.5,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val sigArr = minhashSignatureArrays(docs, n, numHashes, id, text)
      .localCheckpoint(true)
    val nBands = numHashes / rowsPerBand
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = (0 until nBands).toDF("band")
    val banded = sigArr.crossJoin(broadcast(bands))
      .select(col(id), col("band"),
        concat_ws(",", slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))
          .cast("array<string>")).as("band_sig"))
    val a = banded.toDF("id_a", "band", "band_sig")
    val b = banded.toDF("id_b", "band", "band_sig")
    val cand = a.join(b, Seq("band", "band_sig"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(sigArr.toDF("id_a", "sig_a"), "id_a")
      .join(sigArr.toDF("id_b", "sig_b"), "id_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1.0).otherwise(0.0)), lit(0.0), _ + _) /
          size(col("sig_a")).cast("double"))
      .where(col("est_jaccard") >= tau)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** 60-bit SimHash per document over whitespace tokens (weight =
    * occurrence count).
    *
    * All `bits` per-bit contribution sums are parallel aggregate
    * columns of ONE groupBy — no bits-way row multiplication; the
    * per-bit work happens map-side and only |docs| rows shuffle. (The
    * crossJoin-by-bit shape measured ~5x slower at sf0.1.)
    */
  def simhash(docs: DataFrame, bits: Int = 60,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val tokens = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(id))
      .select(col(id), explode(split(trim(AsciiLowerFn(col(text))), "\\s+")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col(id), col("token")).agg(count(lit(1)).as("w"))
      .withColumn("h", hex64(col("token")))
    val bitSums = (0 until bits).map { b =>
      sum(col("w") * (shiftright(col("h"), b).bitwiseAND(1L) * 2L - 1L)).as(s"s_$b")
    }
    tokens.groupBy(col(id))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(id),
        (0 until bits).map(b => when(col(s"s_$b") > 0, 1L << b).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Near-dup pairs with hamming(simhash) <= maxHamming via 4-block
    * pigeonhole blocking (maxHamming <= 3 guarantees a shared block).
    *
    * Carries the same HOT-BUCKET GUARD as [[minhashDupPairs]]: docs
    * with IDENTICAL simhash collapse to one representative (min id)
    * before the block join — an identical-doc flood shares all four
    * block keys, so unguarded the join is quadratic in the flood size.
    * Groups re-enter the output as rep->member star edges (hamming 0 —
    * identical hashes by construction); distinct simhash values are at
    * hamming >= 1, so stars and rep pairs never collide. Duplicate
    * components, and every drop-larger-id consumer (Curation stage 3),
    * are provably unchanged; repeated-simhash-free corpora get the
    * exact unguarded output (HotBucketSpec vs
    * [[simhashPairsUnguarded]]).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3, "4-block pigeonhole covers hamming <= 3")
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE materialization: signatures annotated with their identical-
    // signature group representative (min id) via a window over the
    // 60-bit hash — stars, reps, and the block join all derive from
    // this single cached frame. The previous shape (checkpoint sh,
    // groupBy → second checkpoint, star join back) serialized two
    // eager-checkpoint jobs plus a join per query and benched 45x
    // slower than round 4 (round-5 verdict item 2); the window is one
    // shuffle keyed on simhash, and a 10^4-copy identical-doc flood
    // still lands in a single linear-scan partition (HotBucketSpec).
    // Eager checkpoint for the same AQE-race reason as minhashDupPairs
    // (and with the same executor-loss recompute trade documented there).
    val repW = org.apache.spark.sql.expressions.Window.partitionBy(col("simhash"))
    val shr = simhash(docs, 60, id, text)
      .withColumn("__rep", min(col(id)).over(repW))
      .localCheckpoint(true)
    val stars = shr.where(col(id) =!= col("__rep"))
      .select(col("__rep").as("id_a"), col(id).as("id_b"), lit(0L).as("hamming"))
    val reps = shr.where(col(id) === col("__rep")).select(col(id), col("simhash"))
    val blocks = (0 until 4).toDF("blk")
    val keyed = reps.crossJoin(broadcast(blocks))
      .withColumn("blk_key", expr("(simhash >> (blk * 15)) & 32767"))
    val a = keyed.select(col(id).as("id_a"), col("simhash").as("sim_a"),
      col("blk"), col("blk_key"))
    val b = keyed.select(col(id).as("id_b"), col("simhash").as("sim_b"),
      col("blk"), col("blk_key"))
    a.join(b, Seq("blk", "blk_key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sim_a ^ sim_b)").cast("long").as("hamming"))
      // cheap per-row hamming gate BEFORE the dedup shuffle: distinct
      // then only carries true near-dup pairs, not every block collision
      .where(col("hamming") <= maxHamming)
      .distinct()
      .unionByName(stars)
  }

  /** The UNGUARDED simhash pairing (block join over every document) —
    * quadratic in the largest identical-simhash group; retained for
    * HotBucketSpec's equivalence pin only.
    */
  private[ops] def simhashPairsUnguarded(docs: DataFrame, maxHamming: Int = 3,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = simhash(docs, 60, id, text).localCheckpoint(true)
    val blocks = (0 until 4).toDF("blk")
    val keyed = sh.crossJoin(broadcast(blocks))
      .withColumn("blk_key", expr("(simhash >> (blk * 15)) & 32767"))
    val a = keyed.select(col(id).as("id_a"), col("simhash").as("sim_a"),
      col("blk"), col("blk_key"))
    val b = keyed.select(col(id).as("id_b"), col("simhash").as("sim_b"),
      col("blk"), col("blk_key"))
    a.join(b, Seq("blk", "blk_key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sim_a ^ sim_b)").cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
