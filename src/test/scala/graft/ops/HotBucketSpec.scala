package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Round-4 verdict #1: the hot-bucket guard on the standalone LSH
  * candidate joins. An identical-doc flood (boilerplate pages, routine
  * in web corpora) shares its full signature, so unguarded it lands in
  * ONE bucket on EVERY band and the candidate self-join enumerates
  * C(m,2) pairs in one task — quadratic in the flood size. The guard
  * collapses identical signatures to a min-id representative before
  * pairing and re-enters groups as star edges, so the output (and the
  * join fan-out) stays LINEAR in the flood size while the duplicate
  * components are unchanged.
  */
class HotBucketSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  /** Distinct filler docs: word content varies per id so signatures
    * (minhash and simhash) almost surely differ; seeds make it
    * deterministic, and the equivalence tests additionally assert the
    * no-repeated-signature precondition they rely on.
    */
  private def distinctDocs(n: Int, seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val words = (0 until 30).map(_ => f"w${rnd.nextInt(5000)}%04d")
      (i.toLong, words.mkString(" "))
    }
  }

  test("minhash: a 10^4-copy flood yields linear output, one star per copy") {
    val m = 10000
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
    val flood = (0 until m).map(i => (1000L + i, boiler))
    val rest = distinctDocs(50, seed = 7).map { case (i, t) => (i, t) }
    val out = Dedup.minhashDupPairs(docs(flood ++ rest), n = 8, numHashes = 16,
      rowsPerBand = 4, tau = 0.5).cache()
    try {
      val total = out.count()
      // unguarded this would be >= C(10^4, 2) ~ 5*10^7 candidate pairs;
      // linear means O(flood + distinct-signature pairs)
      assert(total < 2L * (m + 50), s"output not linear in flood size: $total pairs")
      val starRows = out.where($"id_a" === 1000L && $"est_jaccard" === 1.0)
        .select("id_b").as[Long].collect().toSet
      assert(starRows == (1001L until 1000L + m).toSet,
        "every flood copy must appear exactly once as a star edge from the min-id rep")
    } finally { out.unpersist(); () }
  }

  test("simhash: a 10^4-copy flood yields linear output, one star per copy") {
    val m = 10000
    val boiler = "the quick brown fox jumps over the lazy dog again and again and again"
    val flood = (0 until m).map(i => (1000L + i, boiler))
    val rest = distinctDocs(50, seed = 11)
    val out = Dedup.simhashPairs(docs(flood ++ rest), maxHamming = 3).cache()
    try {
      val total = out.count()
      assert(total < 2L * (m + 50), s"output not linear in flood size: $total pairs")
      val stars = out.where($"id_a" === 1000L && $"hamming" === 0L)
        .select("id_b").as[Long].collect().toSet
      assert(stars == (1001L until 1000L + m).toSet)
    } finally { out.unpersist(); () }
  }

  test("minhash guard is a no-op on a repeated-signature-free corpus") {
    val d = docs(distinctDocs(120, seed = 23))
    // precondition the equivalence relies on: all signatures distinct
    val sigs = Dedup.minhashSignatureArrays(d, n = 8, numHashes = 16)
    assert(sigs.select("sig").distinct().count() == 120)
    val guarded = Dedup.minhashDupPairs(d, tau = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val unguarded = Dedup.minhashDupPairsUnguarded(d, tau = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(guarded == unguarded)
  }

  test("simhash guard is a no-op on a repeated-simhash-free corpus") {
    val d = docs(distinctDocs(120, seed = 31))
    val sh = Dedup.simhash(d)
    assert(sh.select("simhash").distinct().count() == 120)
    val guarded = Dedup.simhashPairs(d, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val unguarded = Dedup.simhashPairsUnguarded(d, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(guarded == unguarded)
  }

  test("guarded pairs produce the same duplicate components as unguarded (groups present)") {
    // two identical triples, one identical pair, near-dup bridges, and
    // distinct filler — the shape where guarded and unguarded PAIR
    // LISTS differ but components must not
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val rows = Seq(
      (1L, base), (2L, base), (3L, base),                  // identical triple
      (4L, base + " nu"), (5L, base + " nu"),              // identical pair, near triple
      (10L, "completely different text one two three"),
      (11L, "completely different text one two three four")
    ) ++ distinctDocs(20, seed = 41).map { case (i, t) => (100L + i, t) }
    val d = docs(rows)
    def comps(pairs: DataFrame): Map[Long, Long] =
      ConnectedComponents.connectedComponents(pairs.select("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val g = comps(Dedup.minhashDupPairs(d, tau = 0.5))
    val u = comps(Dedup.minhashDupPairsUnguarded(d, tau = 0.5))
    assert(g == u, "minhash components diverged under the guard")
    val gs = comps(Dedup.simhashPairs(d, maxHamming = 3))
    val us = comps(Dedup.simhashPairsUnguarded(d, maxHamming = 3))
    assert(gs == us, "simhash components diverged under the guard")
  }

  test("incremental minhash == full guarded run restricted to pairs touching the batch") {
    // the fixture plants every incremental shape: a batch doc identical
    // to a corpus doc (cross-split star via a corpus rep), an
    // intra-batch identical pair, a batch near-dup of a corpus doc
    // (cross-split rep pair), corpus-internal duplicates that must NOT
    // be re-reported, and distinct filler on both sides
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpusRows = Seq(
      (1L, base), (2L, base),                   // corpus-internal dup (stays quiet)
      (3L, base + " nu xi omicron")
    ) ++ distinctDocs(15, seed = 61).map { case (i, t) => (10L + i, t) }
    val cut = 500L
    val batchRows = Seq(
      (cut + 1L, base),                          // identical to corpus 1/2
      (cut + 2L, base + " nu xi omicron pi"),    // near-dup of corpus 3
      (cut + 3L, "brand new content aa"), (cut + 4L, "brand new content aa")
    ) ++ distinctDocs(10, seed = 62).map { case (i, t) => (cut + 10L + i, t) }
    val corpus = docs(corpusRows)
    val batch = docs(batchRows)
    val corpusSig = Dedup.minhashSignatureArrays(corpus, 8, 16)
    val inc = Dedup.minhashDupPairsIncremental(corpusSig, batch,
      n = 8, numHashes = 16, rowsPerBand = 4, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e6) / 1e6)).toSet
    val full = Dedup.minhashDupPairs(docs(corpusRows ++ batchRows),
      n = 8, numHashes = 16, rowsPerBand = 4, tau = 0.5)
      .where($"id_a" >= cut || $"id_b" >= cut)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e6) / 1e6)).toSet
    assert(inc == full,
      s"incremental != restricted full:\n only-inc: ${inc.diff(full)}\n only-full: ${full.diff(inc)}")
    // the planted cross-split shapes actually surfaced
    assert(inc.exists(p => p._1 == 1L && p._2 == cut + 1L && p._3 == 1.0),
      "batch copy of a corpus page must star from the corpus rep")
    assert(inc.exists(p => p._2 == cut + 3L || p._1 == cut + 3L),
      "intra-batch identical pair missing")
    // corpus-internal dup is NOT re-reported
    assert(!inc.contains((1L, 2L, 1.0)), "corpus-internal dup re-reported")
  }
}
