package graft.ops

import graft.SparkSpec

/** Unigram-LM tokenizer: the integer micro-log Viterbi and one
  * hand-derivable EM round.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi: max score wins; ties prefer the longest final piece; alphabet fallback") {
    val sc = Map("a" -> -10L, "b" -> -10L, "c" -> -12L, "ab" -> -15L, "abc" -> -18L)
    // [abc] -18 beats [ab,c] -27 and [a,b,c] -32
    assert(UnigramLm.viterbi(sc, 4, "abc") == Seq("abc"))
    // exact tie [ab] -10 vs [a,b] -10: the smaller start index for the
    // final arc wins — the single long piece
    val tie = Map("a" -> -5L, "b" -> -5L, "ab" -> -10L)
    assert(UnigramLm.viterbi(tie, 4, "ab") == Seq("ab"))
    // pieces beyond the vocab decompose to the scored alphabet
    assert(UnigramLm.viterbi(sc, 4, "cab") == Seq("c", "ab"))
    assert(UnigramLm.viterbi(sc, 4, "") == Nil)
    // maxPieceLen bounds arc length even when a longer key exists
    assert(UnigramLm.viterbi(sc, 2, "abc") == Seq("ab", "c"))
  }

  test("one EM round on a hand-derived corpus: per-character beats the rarer long piece") {
    // corpus "aa aa b": seed freqs a=4, aa=2, b=1, T=7. Micro-logs:
    // a = round((ln4-ln7)e6) = -559616, aa = -1252763, b = -1945910.
    // Viterbi("aa"): [a,a] = -1119232 > [aa] = -1252763 — the E-step
    // picks the characters, so "aa" earns ZERO uses and drops out of
    // the M-step despite sitting in the seed vocabulary; uses are
    // freq-weighted (a: 2 occurrences x freq 2 = 4).
    assert(UnigramLm.microLog(4L, 7L) == -559616L)
    assert(UnigramLm.microLog(2L, 7L) == -1252763L)
    assert(UnigramLm.microLog(1L, 7L) == -1945910L)
    val docs = Seq((1L, "aa aa b")).toDF("doc_id", "text")
    val got = UnigramLm.train(docs, maxPieceLen = 2, vocabSize = 64)
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("a", 4L, 0.8), ("b", 1L, 0.2)))
  }

  test("EM iterates to a fixed point; the alphabet floor keeps pruned corpora segmentable") {
    // round 1 on "aa aa b" prunes "aa" (zero uses); round 2
    // re-estimates from {a:4, b:1} + no missing alphabet and must
    // reproduce the same segmentations — the converged fixed point
    val docs = Seq((1L, "aa aa b")).toDF("doc_id", "text")
    val r1 = UnigramLm.train(docs, maxPieceLen = 2, vocabSize = 64, rounds = 1)
      .as[(String, Long, Double)].collect().toSet
    val r3 = UnigramLm.train(docs, maxPieceLen = 2, vocabSize = 64, rounds = 3)
      .as[(String, Long, Double)].collect().toSet
    assert(r1 == r3, s"EM left its fixed point: $r1 vs $r3")

    // a corpus whose round-1 E-step uses ONLY multi-char pieces: the
    // re-estimation must floor the unused alphabet at 1, or round 2
    // could not segment anything off the surviving pieces
    val docs2 = Seq((1L, "abc abc abc ab")).toDF("doc_id", "text")
    val out = UnigramLm.train(docs2, maxPieceLen = 3, vocabSize = 64, rounds = 2)
      .as[(String, Long, Double)].collect().toSet
    assert(out.map(_._1) == Set("abc", "ab"),
      s"round-2 segmentation moved off the converged pieces: $out")
  }

  test("perplexityBuckets: probable text scores above rare text and takes the head") {
    // one language, three docs on a common/rare axis: the common-word
    // doc must out-score the mixed doc must out-score the rare-word
    // doc, and the tercile split must bucket them head/middle/tail
    val docs = Seq(
      (1L, "en", "aa aa aa aa"),
      (2L, "en", "aa aa zq"),
      (3L, "en", "zq zq zq")).toDF("doc_id", "lang", "text")
    val out = UnigramLm.perplexityBuckets(docs, maxPieceLen = 2, vocabSize = 64)
      .select("doc_id", "n_tokens", "lm_score", "bucket")
      .as[(Long, Long, Double, String)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._3 > out(2L)._3 && out(2L)._3 > out(3L)._3,
      s"lm_score must fall with word rarity: $out")
    assert(out(1L)._4 == "head" && out(2L)._4 == "middle" && out(3L)._4 == "tail")
  }

  test("perplexityBuckets: words with out-of-alphabet characters drop (OOV contract)") {
    // maxWords=1 keeps only "aa" in the trained alphabet: "qq" cannot
    // segment, so it vanishes from token counts and a doc of ONLY
    // unscorable words vanishes from the output — the inner-join
    // semantics the SQL oracle replays structurally
    val docs = Seq(
      (1L, "en", "aa aa"),
      (2L, "en", "aa qq"),
      (3L, "en", "qq")).toDF("doc_id", "lang", "text")
    val out = UnigramLm.perplexityBuckets(docs, maxPieceLen = 2, vocabSize = 64,
        maxWords = 1)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 4L, 2L -> 2L),
      s"OOV words must drop from counts and OOV-only docs from output: $out")
  }
}
