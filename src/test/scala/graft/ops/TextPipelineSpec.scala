package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture-level behavior of the round-4 text-pipeline operators
  * (p26 decontamination, p27 repetition, p28 PII) — the oracle gate
  * checks corpus-scale parity; these pin the semantics on inputs where
  * the expected values are hand-checkable, including shapes the
  * synthetic corpus doesn't exercise (real emails/phones, blank text).
  */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("p56: BM25 — rare term outranks common, tf saturates under k1, k cuts deterministically") {
    val d = Seq(
      (1L, "dup apple"),                 // the rare query term, short doc
      (2L, "hash hash hash hash"),       // common term, high tf
      (3L, "hash apple apple apple"),    // common term, tf 1, same length
      (4L, "apple apple")                // no query term: absent
    ).toDF("doc_id", "text")
    val out = TextStats.bm25TopK(d, Seq("dup", "hash"), k = 10)
      .select("doc_id", "n_terms", "bm25")
      .as[(Long, Long, Double)].collect()
    // ordering is the result order (TakeOrderedAndProject), pre-sorted
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L),
      s"rare-term doc must lead, tf must break the hash tie: ${out.toSeq}")
    assert(out.forall(_._2 == 1L))
    // idf(dup) = ln(1 + 3.5/1.5) > idf(hash) = ln(2): rare term wins
    // even against tf=4 of the common term
    assert(out(0)._3 > out(1)._3 && out(1)._3 > out(2)._3)
    // tf saturation: doc 2's 4 occurrences score less than 4x doc 3
    assert(out(1)._3 < 4.0 * out(2)._3)
    // the k cut keeps the score order prefix
    val cut = TextStats.bm25TopK(d, Seq("dup", "hash"), k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(cut == Seq(1L, 2L), s"got $cut")
    intercept[IllegalArgumentException] { TextStats.bm25TopK(d, Seq(), 5) }
    intercept[IllegalArgumentException] { TextStats.bm25TopK(d, Seq("dup"), 0) }
  }

  test("p43: linear scorer — hand-checked lattice weights, blank gates NULL, threshold monotone") {
    val d = Seq((1L, "alpha beta"), (2L, "alpha"), (3L, "  "), (4L, "ALPHA beta"))
      .toDF("doc_id", "text")
    val out = TextStats.scoreLinear(d, nFeatures = 64, threshold = 0.0)
      .select("doc_id", "n_features", "quality_logit", "keep")
      .as[(Long, Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // hand-derived expectation via the same driver-side hash twin
    def w(g: String): Long =
      graft.ops.Hashing.hex64Local(
        "w:" + (graft.ops.Hashing.hex64Local(g) % 64)) % 2001 - 1000
    val expected = (w("alpha") + w("beta") + w("alpha beta")) / 3000.0
    assert(out(1L)._2 == 3)
    assert(out(1L)._3.contains(BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(out(1L)._4 == (expected > 0.0))
    // case-folding: "ALPHA beta" scores identically to "alpha beta"
    assert(out(4L) == out(1L).copy(_1 = 4L))
    // single token: no bigram, 1 feature
    assert(out(2L)._2 == 1)
    // blank doc survives with NULL logit and keep = false, not dropped
    assert(out(3L) == ((3L, 0L, None, false)))
    // threshold monotonicity: raising it can only shrink the kept set
    val kept0 = TextStats.scoreLinear(d, 64, -1.0).where(col("keep")).count()
    val kept1 = TextStats.scoreLinear(d, 64, 1.0).where(col("keep")).count()
    assert(kept1 <= kept0 && kept0 == 3)
  }

  test("p47: vocab ids are deterministic (count desc, token asc); fingerprint is hand-checkable; OOV -> 0") {
    val d = Seq((1L, "b a a"), (2L, "c a"), (3L, "   "))
      .toDF("doc_id", "text")
    val vocab = TextStats.buildVocab(d, k = 2)
      .select("token_id", "token", "n_occurrences")
      .as[(Long, String, Long)].collect().toSeq
    // a wins on count (3); b beats c on the token-asc tie at count 1
    assert(vocab == Seq((1L, "a", 3L), (2L, "b", 1L)))
    val enc = TextStats.encodeFingerprint(d, TextStats.buildVocab(d, k = 2))
      .select("doc_id", "n_tokens", "n_oov", "ids_fp")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1 = [b a a] -> ids [2 1 1] -> fp 1*3 + 2*2 + 3*2 = 13
    assert(enc(1L) == ((1L, 3L, 0L, 13L)))
    // doc 2 = [c a] -> ids [0 1], c is OOV -> fp 1*1 + 2*2 = 5
    assert(enc(2L) == ((2L, 2L, 1L, 5L)))
    // blank docs have no tokens and no encode row
    assert(!enc.contains(3L))
  }

  test("p82: budgets are exact Hamilton apportionment; rebalance narrows the per-language OOV spread") {
    // hand case: weights (5,3,1), k=10 -> floors (5,3,1) leave one
    // seat; remainders (5,3,1)/9 give it to 'a' -> (6,3,1), sum EXACTLY k
    val w = Seq(("a", 5L), ("b", 3L), ("c", 1L)).toDF("lang", "w")
    val got = TextStats.vocabBudgets(w, 10)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 6L, "b" -> 3L, "c" -> 1L), s"got $got")

    // planted corpus: dominant lang A (13 distinct tokens, huge counts)
    // vs low-resource lang B (21 distinct tokens, tiny counts). A
    // GLOBAL top-13 vocab admits almost only A's tokens, so B is
    // heavily OOV — the under-service p78 detects. Reallocating the
    // SAME 13 slots by an under-service weight must cut B's OOV and
    // narrow the A-vs-B OOV spread (the "fertility converges toward
    // the target" contract at vocab level).
    val docs = ((1L to 90L).map(i => (i, "A", s"alpha beta gamma t${i % 10}")) ++
        (101L to 110L).map(i => (i, "B", s"zeta$i eta$i theta")))
      .toDF("doc_id", "lang", "text")
    def oovBps(vocabTokens: Set[String]): Map[String, Long] =
      docs.select(col("lang"), explode(split(trim(lower(col("text"))), "\\s+")).as("tk"))
        .where(col("tk") =!= "").as[(String, String)].collect()
        .groupBy(_._1).map { case (l, rows) =>
          l -> rows.count(r => !vocabTokens.contains(r._2)) * 10000L / rows.length
        }
    val globalVocab = TextStats.buildVocab(docs, k = 13)
      .select("token").as[String].collect().toSet
    val before = oovBps(globalVocab)
    assert(before("B") > 5000L, s"fixture must under-serve B: $before")
    // under-service weights (a base term keeps the dominant language
    // from starving — the damped form a production loop would use)
    val weights = Seq(("A", 2000L + before("A")), ("B", 2000L + before("B")))
      .toDF("lang", "w")
    val budgets = TextStats.vocabBudgets(weights, 13)
    val budgetMap = budgets.as[(String, Long)].collect().toMap
    assert(budgetMap.values.sum == 13L, "budgets must spend exactly k")
    assert(budgetMap("B") > budgetMap("A"),
      s"the under-served language must win budget: $budgetMap")
    val rebalanced = TextStats.buildVocabPerGroup(docs, budgets)
    // per-group admission respects the budget and the (count desc,
    // token asc) rank — the family-level determinism invariant
    val byLang = rebalanced.select("lang", "vocab_rank")
      .as[(String, Long)].collect().groupBy(_._1)
    byLang.foreach { case (l, rs) =>
      assert(rs.length <= budgetMap(l).toInt && rs.map(_._2).max <= budgetMap(l))
    }
    val after = oovBps(rebalanced.select("token").as[String].collect().toSet)
    assert(after("B") < before("B"),
      s"rebalance must cut B's OOV: ${before("B")} -> ${after("B")}")
    val spreadBefore = (before("A") - before("B")).abs
    val spreadAfter = (after("A") - after("B")).abs
    assert(spreadAfter < spreadBefore,
      s"service spread must narrow: $spreadBefore -> $spreadAfter ($before -> $after)")
  }

  test("p26: contamination flags docs sharing >= minShared distinct word n-grams with a benchmark") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "quick brown fox jumps high above everything else today"), // shares 3-grams with bench 10
      (3L, "completely different text with no overlap at all"),
      (4L, "")).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "the quick brown fox jumps over fences")).toDF("bench_id", "text")
    val got = TextStats.contaminationPairs(corpus, bench, n = 3, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1 shares: "the quick brown", "quick brown fox", "brown fox
    // jumps", "fox jumps over" = 4; doc 2 shares only 2 ("quick brown
    // fox", "brown fox jumps") -> below threshold; doc 3/4 none
    assert(got == Set((1L, 10L, 4L)))
    // lowering the threshold admits doc 2
    val loose = TextStats.contaminationPairs(corpus, bench, n = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == Set((1L, 10L), (2L, 10L)))
  }

  test("p27: repetition ratio separates boilerplate from prose; blank/short texts score 0") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"),   // bigrams: 7, distinct 2
      (2L, "each word appears exactly once here"), // no repeated bigram
      (3L, "one"),                                 // < n tokens
      (4L, "")).toDF("doc_id", "text")
    val got = TextStats.withRepetitionColumns(docs, n = 2)
      .select("doc_id", "n_ngrams", "dup_ngram_ratio")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((7L, 5.0 / 7.0)))
    assert(got(2L) == ((5L, 0.0)))
    assert(got(3L) == ((0L, 0.0)))
    assert(got(4L) == ((0L, 0.0)))
  }

  test("p29: token-budget sampling keeps a maximal per-stratum prefix, monotone in budget, append-stable") {
    val docs = Seq(
      (1L, "srcA", "one two three"),            // 3 tokens
      (2L, "srcA", "a b c d e f g h"),          // 8
      (3L, "srcA", "x y"),                      // 2
      (4L, "srcA", ""),                         // 0
      (5L, "srcB", "alpha beta gamma delta")    // 4
    ).toDF("doc_id", "source", "text")
    def ids(budget: Long, df: org.apache.spark.sql.DataFrame = docs): Set[Long] =
      Sampling.tokenBudgetSample(df, Seq("source"), budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    // budget sweep: each stratum's kept set grows monotonically and
    // cum_tokens never exceeds the budget
    val sweep = Seq(0L, 2L, 5L, 10L, 100L).map(b => b -> ids(b))
    sweep.sliding(2).foreach { case Seq((b1, s1), (b2, s2)) =>
      assert(s1.subsetOf(s2), s"budget $b1 -> $b2 dropped docs: ${s1 -- s2}")
    }
    // zero-token docs consume no budget: they stay IN whenever they
    // precede the cut in hash order (doc 4 hashes first in srcA here)
    assert(ids(0) == Set(4L))
    assert(ids(100) == Set(1L, 2L, 3L, 4L, 5L)) // everything fits
    val sample = Sampling.tokenBudgetSample(docs, Seq("source"), 10L)
    assert(sample.collect().forall(_.getAs[Long]("cum_tokens") <= 10L))
    // append stability: adding a NEW stratum never changes srcA's cut
    val more = docs.unionByName(Seq((9L, "srcC", "k l m")).toDF("doc_id", "source", "text"))
    assert(ids(10, more).filter(_ <= 4L) == ids(10).filter(_ <= 4L))
  }

  test("p30: every funnel stage cuts — quality gate, normalized dup, order-permuted near-dup, budget") {
    val docs = Seq(
      // srcA: d1 good prose (score 0.875); d2 is d1's tokens PERMUTED —
      // different normalized digest (survives stage 2) but an identical
      // token multiset means an IDENTICAL SimHash (hamming 0), so stage
      // 3 drops the larger id deterministically; d3 normalizes to
      // exactly d1 (punctuation-only delta) -> stage-2 dup; d4 is
      // punct-heavy junk (score 0.3) -> gate-dropped
      (1L, "srcA", "the quick brown fox jumps over the lazy dog today"),
      (2L, "srcA", "today dog lazy the over jumps fox brown quick the"),
      (3L, "srcA", "The quick brown fox jumps over the lazy dog today!!!"),
      (4L, "srcA", "#### !!!! ???? ****"),
      // srcB: two equal-quality docs; a 12-token budget admits only the
      // hash-first one
      (5L, "srcB", "the cat sat on the mat and it was that fine day"),
      (6L, "srcB", "it is that the dog ran to the park and then home")
    ).toDF("doc_id", "source", "text")
    val out = Curation.curate(docs, minQuality = 0.5, budgetTokens = 12L,
      maxHamming = 3, strata = Seq("source"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet.filter(_ <= 4L) == Set(1L),
      s"srcA should keep exactly d1: $out")
    assert(out(1L) == 10L)
    assert(out.keySet.count(_ >= 5L) == 1,
      s"srcB's 12-token budget admits exactly one 12-token doc: $out")
  }

  test("p28: PII counts and redaction on real email/phone shapes") {
    val docs = Seq(
      (1L, "contact alice@example.com or bob.smith+x@mail.co.uk now"),
      (2L, "call 555-123-4567 or 555 987 6543 today"),
      (3L, "mixed: c@d.org and 111-222-3333"),
      (4L, "no pii here, just text with @ and 12345"),
      (5L, "odd: 555-123-4567@relay.example.com")).toDF("doc_id", "text")
    val got = TextStats.withPiiColumns(docs)
      .select("doc_id", "n_emails", "n_phones", "redacted")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L)._1 == 2 && got(1L)._2 == 0)
    assert(got(1L)._3 == "contact <EMAIL> or <EMAIL> now")
    assert(got(2L)._1 == 0 && got(2L)._2 == 2)
    assert(got(2L)._3 == "call <PHONE> or <PHONE> today")
    assert(got(3L) == ((1L, 1L, "mixed: <EMAIL> and <PHONE>")))
    assert(got(4L) == ((0L, 0L, "no pii here, just text with @ and 12345")))
    // a phone-shaped substring swallowed by an email counts ONCE, as
    // the email — counts always equal the placeholders in `redacted`
    assert(got(5L) == ((1L, 0L, "odd: <EMAIL>")))
  }
}
