package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property tests for the round-10 primitives: the bounded top-k
  * fold's partition invariance (the streaming-state correctness
  * claim), kappa's range and identity laws on arbitrary rater pairs,
  * ciRanks' bounds at every resample count, and the BPE encode
  * strategy equivalence over randomized words (the structural claim —
  * trained merges only create higher-rank pairs — exercised far past
  * the example-based spec).
  */
object EvalPropertySpec extends Properties("graft.ops.round10") {

  private lazy val spark = SparkSpec.session

  // --- TopKCandAgg: any partition of any input folds to the true top-k

  private val candGen: Gen[(Int, List[(Double, Long)], List[Int])] = for {
    k <- Gen.choose(1, 6)
    n <- Gen.choose(0, 60)
    // coarse score grid on purpose: duplicate scores stress the
    // (nc, neighbor_id) tie order
    cands <- Gen.listOfN(n, for {
      s <- Gen.choose(-5, 5); id <- Gen.choose(0L, 30L)
    } yield (s.toDouble / 2.0, id))
    cuts <- Gen.listOfN(3, Gen.choose(0, math.max(n, 1)))
  } yield (k, cands, cuts.sorted)

  propertyWithSeed("bounded top-k fold is partition-invariant and exact", None) =
    Prop.forAllNoShrink(candGen) { case (k, cands, cuts) =>
      val agg = new TopKCandAgg(k)
      def fold(xs: Seq[(Double, Long)]): TopKBuf =
        xs.foldLeft(agg.zero)((b, c) => agg.reduce(b, ScoredCand(c._1, c._2)))
      val whole = fold(cands)
      val expect = cands.map(c => ScoredCand(c._1, c._2))
        .sorted(Ordering.by((c: ScoredCand) => (c.nc, c.neighbor_id))).take(k)
      val parts = (0 :: cuts ::: List(cands.length)).distinct.sorted
        .sliding(2).collect { case List(a, b) => cands.slice(a, b) }.toList
      val merged = parts.map(fold).foldLeft(agg.zero)(agg.merge)
      (whole.cands == expect) :| s"whole fold wrong: ${whole.cands} vs $expect" &&
        (merged == whole) :| s"partitioned fold diverged: $merged vs $whole" &&
        (whole.cands.length <= k) :| "buffer exceeded k"
    }

  // --- kappa: range and identity laws on arbitrary rater pairs

  private val raterGen: Gen[List[(Boolean, Boolean)]] = for {
    n <- Gen.choose(1, 40)
    pairs <- Gen.listOfN(n, for {
      a <- Gen.oneOf(true, false); b <- Gen.oneOf(true, false)
    } yield (a, b))
  } yield pairs

  propertyWithSeed("kappa is in [-1, 1]; exactly 1 on identical non-constant raters; NULL only when pe = 1", None) =
    Prop.forAllNoShrink(raterGen) { pairs =>
      val s = spark
      import s.implicits._
      val a = pairs.zipWithIndex.map { case ((ka, _), i) => (i.toLong, "g", ka) }
        .toDF("doc_id", "g", "keep")
      val b = pairs.zipWithIndex.map { case ((_, kb), i) => (i.toLong, "g", kb) }
        .toDF("doc_id", "g", "keep").select("doc_id", "keep")
      val row = Evaluation.agreementKappa(a, b, "g").collect().head
      val kap = Option(row.getAs[java.lang.Double]("kappa")).map(_.doubleValue)
      val n = pairs.length.toLong
      val r1 = pairs.count(_._1).toLong
      val c1 = pairs.count(_._2).toLong
      val pe = r1 * c1 + (n - r1) * (n - c1)
      val constant = pe == n * n
      val identical = pairs.forall(p => p._1 == p._2)
      (row.getAs[Long]("n_docs") == n) :| "n_docs wrong" &&
        (kap.isEmpty == constant) :| s"NULL iff both-constant: kappa=$kap pe=$pe n²=${n * n}" &&
        kap.forall(v => v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9) :| s"kappa out of range: $kap" &&
        (!(identical && !constant) || kap.contains(1.0)) :| s"identical raters must score 1: $kap"
    }

  // --- ciRanks: bounds at every b

  propertyWithSeed("ciRanks stays inside [1, b], ordered, and anchors at (2, 63) for b = 64", None) =
    Prop.forAllNoShrink(Gen.choose(4, 4096)) { b =>
      val (lo, hi) = Bootstrap.ciRanks(b)
      (lo >= 1 && lo <= hi && hi <= b) :| s"ranks out of bounds: ($lo, $hi) for b=$b" &&
        (Bootstrap.ciRanks(64) == ((2, 63))) :| "b=64 anchor moved"
    }

  // --- BPE: lowest-rank-first == ordered single pass on trained merges

  private lazy val trainedRanks: Map[(String, String), Int] = {
    val s = spark
    import s.implicits._
    val words = Seq("low", "lower", "lowest", "newest", "widest", "news",
      "wide", "wider", "slow", "slower", "flow", "flows", "glow", "glows",
      "lowly", "newly")
    val docs = words.zipWithIndex.flatMap { case (w, i) => Seq.fill(i % 4 + 1)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    Bpe.learnMerges(docs, numMerges = 48).map(m => (m.lhs, m.rhs) -> m.rank).toMap
  }

  private val wordGen: Gen[String] = for {
    len <- Gen.choose(1, 12)
    cs <- Gen.listOfN(len, Gen.oneOf("lownewidest".toSeq))
  } yield cs.mkString

  propertyWithSeed("encodeWordRanked == encodeWordOrdered on random words over trained merges", None) =
    Prop.forAllNoShrink(wordGen) { w =>
      val ranks = trainedRanks
      val ordered = ranks.toSeq.sortBy(_._2).map(_._1)
      val a = Bpe.encodeWordRanked(ranks, w)
      val b = Bpe.encodeWordOrdered(ordered, w)
      (a == b) :| s"strategies diverged on '$w': $a vs $b" &&
        (a.mkString == w + Bpe.EndOfWord) :| s"encode must preserve the word: $a"
    }

  // 20 trials: the kappa property runs a (tiny) Spark job per trial;
  // the other three are pure JVM and cheap at any count
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)
}
