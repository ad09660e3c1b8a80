package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge learning + encoding, pinned on hand-derivable corpora:
  * the deterministic merge sequence (count desc, (lhs, rhs) asc
  * tie-break), the greedy non-overlapping merge application, and the
  * classic generalization property — an UNSEEN word segments into
  * units learned from seen words.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge sequence on the Sennrich-style corpus is the hand-derived one") {
    // low x5, lower x2, newest x6, widest x3 — the paper's worked
    // example, under THIS repo's total-order tie-break. Hand
    // derivation: es(9, ties es/st/t</w> broken lexicographically),
    // est(9), est</w>(9), lo(7), low(7), ew(6), ewest</w>(6),
    // newest</w>(6).
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, numMerges = 8)
    assert(merges.map(m => (m.lhs, m.rhs, m.pairCount)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L),
      ("e", "w", 6L), ("ew", "est</w>", 6L), ("n", "ewest</w>", 6L)))
    assert(merges.map(_.rank) == (1 to 8))
    assert(merges.forall(m => m.merged == m.lhs + m.rhs))

    val ranks = merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    // training words reproduce their training segmentation
    assert(Bpe.encodeWord(ranks, "newest") == Seq("newest</w>"))
    assert(Bpe.encodeWord(ranks, "low") == Seq("low", "</w>"))
    // the classic generalization: "lowest" was NEVER seen, but
    // segments into units learned from "low" and "newest"/"widest"
    assert(Bpe.encodeWord(ranks, "lowest") == Seq("low", "est</w>"))
    // fully OOV: falls back to characters + sentinel
    assert(Bpe.encodeWord(ranks, "xyz") == Seq("x", "y", "z", "</w>"))
  }

  test("overlapping runs merge greedily left-to-right, non-overlapping") {
    // "aaa" under (a,a): [aa, a, </w>], never [a, aa, </w>] and never
    // a double-consume — the parity case the SQL oracle must replay
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, numMerges = 3)
    assert(merges.map(m => (m.lhs, m.rhs, m.pairCount)) == Seq(
      ("a", "a", 4L),        // two adjacencies per word, freq 2
      ("a", "</w>", 2L),     // tie aa-a vs a-</w> at 2 -> "a" < "aa"
      ("aa", "a</w>", 2L)))
    val ranks = merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    assert(Bpe.encodeWord(ranks, "aaa") == Seq("aaa</w>"))
    assert(Bpe.encodeWord(ranks, "aaaa") == Seq("aa", "aa", "</w>"))
    assert(Bpe.encodeWord(ranks, "aaaaa") == Seq("aa", "aaa</w>"))
  }

  test("training exhausts early when every word is one symbol; encode DataFrame round-trips") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // ab: a-b 2, b-</w> 2, c-d 1, d-</w> 1 -> merges until every word
    // is a single symbol: requested 50, produced far fewer
    val merges = Bpe.learnMerges(docs, numMerges = 50)
    assert(merges.size < 50 && merges.nonEmpty,
      s"expected early exhaustion, got ${merges.size} merges")
    // post-exhaustion both words ARE single symbols
    val ranks = merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    assert(Bpe.encodeWord(ranks, "ab") == Seq("ab</w>"))
    assert(Bpe.encodeWord(ranks, "cd") == Seq("cd</w>"))

    val enc = Bpe.encode(docs, merges)
      .orderBy("doc_id").as[(Long, Long, Seq[String])].collect()
    assert(enc.toSeq == Seq((1L, 3L, Seq("ab</w>", "ab</w>", "cd</w>"))))

    // null text encodes to zero tokens, not a crash or a lost row
    val withNull = Seq((1L, "ab"), (2L, null)).toDF("doc_id", "text")
    val enc2 = Bpe.encode(withNull, merges)
      .orderBy("doc_id").as[(Long, Long, Seq[String])].collect()
    assert(enc2.toSeq == Seq((1L, 1L, Seq("ab</w>")), (2L, 0L, Seq.empty[String])))
  }

  test("encodeWordRanked (production lowest-rank-first) == encodeWordOrdered on trained merges, incl. novel words") {
    // a richer corpus so merges nest several levels deep
    val words = Seq("low", "lower", "lowest", "newest", "widest", "news",
      "wide", "wider", "slow", "slower", "flow", "flows", "glow")
    val docs = words.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(i % 5 + 1)(w) }.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, numMerges = 40)
    assert(merges.size > 10, s"corpus should yield >10 merges, got ${merges.size}")
    val ranks = merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    val ordered = merges.sortBy(_.rank).map(m => (m.lhs, m.rhs))
    // trained words, novel compositions, OOV, single chars
    val probes = words ++ Seq("lowers", "newer", "slowest", "glowing",
      "xyz", "a", "wwww", "lownewswide")
    for (w <- probes) {
      val viaRanked = Bpe.encodeWordRanked(ranks, w)
      val viaOrdered = Bpe.encodeWordOrdered(ordered, w)
      assert(viaRanked == viaOrdered,
        s"strategies diverged on '$w': ranked=$viaRanked ordered=$viaOrdered")
    }
    // a padded rank map (synthetic never-matching merges appended at
    // high ranks — the production-probe shape) must not perturb the
    // encode: the pad is unreachable by construction
    val padded = ranks ++ (1 to 1000).map(i =>
      (s"\u0001pad$i", "\u0001") -> (1000000 + i))
    for (w <- probes)
      assert(Bpe.encodeWordRanked(padded, w) == Bpe.encodeWordRanked(ranks, w))
  }

  test("encodeCorpus (declarative) computes exactly the scalar encode path's tokens") {
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest") :+ "low lowest xyz")
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, numMerges = 8)
    val ranks = merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap

    // independent expectation: encodeWord per word + the fingerprint
    // formula, computed driver-side
    def hex64(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val expected = docs.as[(Long, String)].collect().map { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => Bpe.encodeWord(ranks, w)).toSeq
      val fp = toks.zipWithIndex.map { case (s, i) =>
        (i + 1L) * (hex64(s) % 1000L + 1L) }.sum
      (id, toks.size.toLong, fp)
    }.toSet
    val got = Bpe.encodeCorpus(docs, merges)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
    // the mixed doc exercises several words in one position sequence
    // (the corpus here INCLUDES "lowest", so the learned merges differ
    // from the first test's corpus — 7 tokens, pinned from the
    // scalar-path computation the first assert already proved equal)
    val mixed = got.find(_._1 == 16L).get
    assert(mixed._2 == 7L, s"mixed doc token count: $mixed")

    // the plan-depth guard is enforced, not advisory
    val big = (1 to 65).map(i => Bpe.Merge(i, s"a$i", s"b$i", s"a${i}b$i", 1L))
    assertThrows[IllegalArgumentException](Bpe.encodeCorpus(docs, big))
  }

  test("p78: fertility/compression stats — hand-derivable on a two-language corpus") {
    // lang A: "low low" docs (words fully learnable -> 1 token each);
    // lang B: an OOV word that stays character-split
    val docs = Seq(
      (1L, "A", "low low"), (2L, "A", "low"),
      (3L, "B", "xyz"))
      .toDF("doc_id", "lang", "text")
    val merges = Bpe.learnMerges(docs.where(col("lang") === "A"), numMerges = 8)
    val ranks = merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    assert(Bpe.encodeWord(ranks, "low") == Seq("low</w>"))
    val out = Bpe.fertilityStats(docs, merges).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val a = out("A")
    // 3 words -> 3 single tokens; chars: "low low"=7 + "low"=3 = 10
    assert(a.getAs[Long]("n_docs") == 2L && a.getAs[Long]("n_words") == 3L)
    assert(a.getAs[Long]("n_tokens") == 3L && a.getAs[Long]("n_chars") == 10L)
    assert(a.getAs[Double]("fertility") == 1.0)
    assert(a.getAs[Double]("chars_per_token") == round6(10.0 / 3.0))
    val b = out("B")
    // "xyz" is fully OOV: x, y, z, </w> = 4 tokens for 1 word
    assert(b.getAs[Long]("n_tokens") == 4L && b.getAs[Long]("n_words") == 1L)
    assert(b.getAs[Double]("fertility") == 4.0)
  }

  test("p78: fertilityStats survives a production-sized merge list (routes through the encode tier)") {
    // round 11: billed as the production tokenizer-quality metric, so
    // it must not throw at 30k-scale merge lists — past encodeCorpus's
    // 64-merge cap it routes through Bpe.encode (broadcast rank map)
    // and the two tiers agree on the shared prefix of real merges
    val docs = Seq(
      (1L, "A", "low low lower"), (2L, "A", "low"),
      (3L, "B", "xyz zyx"))
      .toDF("doc_id", "lang", "text")
    val real = Bpe.learnMerges(docs, numMerges = 8)
    assert(real.size <= 64, "fixture merges must fit the declarative cap")
    val viaDeclarative = Bpe.fertilityStats(docs, real).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("fertility"))).toSet
    // pad with never-applying merges of unseen symbols to force >64:
    // the encode tier must compute the identical stats
    val pad = (0 until 100).map(i => Bpe.Merge(real.size + i,
      s"§$i", s"¶$i", s"§$i¶$i", 1L))
    val viaProduction = Bpe.fertilityStats(docs, real ++ pad).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("fertility"))).toSet
    assert(viaProduction == viaDeclarative,
      s"production tier stats diverged: $viaProduction vs $viaDeclarative")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("train() emits the merge table with the declared schema and maxWords caps the fit") {
    val docs = Seq((1L, "aa aa bb")).toDF("doc_id", "text")
    val df = Bpe.train(docs, numMerges = 2)
    assert(df.columns.toSeq == Seq("rank", "lhs", "rhs", "merged", "pair_count"))
    val rows = df.orderBy("rank").collect()
    // round 1 ties (a,a) with (a,"</w>") at count 2; "</w>" < "a"
    // lexicographically, so the sentinel pair wins the tie-break
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq ==
      Seq((1L, "a", "</w>", "a</w>", 2L), (2L, "a", "a</w>", "aa</w>", 2L)))
    // maxWords = 1 keeps only the most frequent word ("aa") in the fit
    val capped = Bpe.learnMerges(docs, numMerges = 1, maxWords = 1)
    assert(capped.head.pairCount == 2L, s"cap leaked the 'bb' word: ${capped.head}")
  }
}
