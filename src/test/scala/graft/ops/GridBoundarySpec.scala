package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The exp/ln pre-quantization contract, pinned (round-9 verdict #5).
  *
  * Every trained cross-engine-exact query (p57/p70 LR, p62 hashed LR,
  * p58 DSIR — and the streaming monitors x26/x27, which serve the
  * SAME scoring definitions, so they are covered by construction)
  * rounds a transcendental output to the 1e-6 micro grid on BOTH
  * engines: round(v) with v = sigmoid(z)·1e6 or (ln f − ln t)·1e6.
  * JDK Math.exp/log and DuckDB's libm can disagree in the last ulp,
  * so a rounding can diverge cross-engine ONLY if the pre-round
  * double sits within that ulp noise of a half-integer grid boundary.
  * Propagated to the grid, a few ulps of exp/ln input noise move v by
  * at most ~|v|·2^-50 — ≤ 2.2e-9 at the p-hat/gradient scale
  * (|v| ≤ 1e6), ≤ ~1e-8 at the micro-log scale (|v| ≤ ~1.2e7).
  *
  * This spec turns the standing "it never lands that close"
  * assumption into a MEASURED contract: it replays every rounding
  * site of the trained surface on the real sf0.01 verify corpus and
  * asserts the minimum distance to the nearest half-integer boundary
  * exceeds 1e-6 micro-units — ≥100× the worst-case cross-engine
  * wiggle. While it holds, the DuckDB oracle replay of these queries
  * is DETERMINISTIC, not probabilistic. If a fixture regeneration or
  * a model change ever pulls a site inside the margin, this spec
  * fails NAMING the surface, and that query must move to the a6
  * tolerance-flag discipline (exact twins + deterministically-true
  * flag columns) before it ships — verify never silently flakes.
  *
  * Measured 2026-08-15 on sf0.01: p57 2.3e-3, p70 4.4e-4, p62
  * 2.9e-4, p58 1.1e-2 micro-units — 290× to 10,000× the floor.
  *
  * (The p49–p54 tokenizer micro-logs share the same budget; their
  * rounding sites are vocab-bounded — thousands, not corpus-scaled —
  * and their piece scores run through the identical microLog helper
  * audited here via p58's sites.)
  */
class GridBoundarySpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  /** Safety floor: ≥100× the worst-case few-ulp propagation. */
  private val FloorMicro = 1e-6

  /** Min distance of |v| (already in micro-units) to the nearest
    * half-integer rounding boundary, over all rows of `df`.
    */
  private def minBoundaryDist(df: DataFrame, v: Column): Double = {
    val a = abs(v)
    val frac = a - floor(a)
    df.select(min(abs(frac - lit(0.5))).cast("double").as("d")).as[Double].head()
  }

  private def auditLr(name: String, feat: DataFrame, rounds: Int,
      lrNum: Long, arity: Int): Unit = {
    var worst = Double.MaxValue
    for (k <- 0 until rounds) {
      val w = if (k == 0) Array.fill(arity)(0L) else Logistic.train(feat, k, lrNum)
      val p = Logistic.sigmoid(Logistic.zOf(w))
      for (j <- 0 until arity) {
        val d = minBoundaryDist(feat, (p - col("y")) * col(s"x$j") * lit(1e6))
        worst = math.min(worst, d)
      }
    }
    val wFinal = Logistic.train(feat, rounds, lrNum)
    worst = math.min(worst,
      minBoundaryDist(feat, Logistic.sigmoid(Logistic.zOf(wFinal)) * lit(1e6)))
    info(f"$name min boundary distance = $worst%.3e micro-units")
    assert(worst > FloorMicro,
      s"$name has a rounding site $worst micro-units from a grid boundary " +
        s"(floor $FloorMicro): cross-engine exp/ln ulp noise could flip it — " +
        "move this query to the a6 tolerance-flag discipline")
  }

  test("p57/x26: every gradient and p-hat rounding site is boundary-safe on the verify corpus") {
    auditLr("p57", Logistic.features(docs).localCheckpoint(true),
      rounds = 3, lrNum = 4L, arity = 4)
  }

  test("p70: the extended-arity surface is boundary-safe too") {
    auditLr("p70", Logistic.featuresExtended(docs).localCheckpoint(true),
      rounds = 3, lrNum = 4L, arity = 6)
  }

  test("p62: hashed-LR contribution and p-hat sites are boundary-safe") {
    val nBuckets = 64
    val feat = Logistic.hashedFeatures(docs, nBuckets).localCheckpoint(true)
    val nonEmpty = feat.where(col("n_feat") > 0)
    var worst = Double.MaxValue
    for (k <- 0 until 2) {
      val w = if (k == 0) Array.fill(nBuckets)(0L)
        else Logistic.trainHashed(feat, nBuckets, k)
      val p = Logistic.sigmoid(Logistic.zHashed(w))
      worst = math.min(worst, minBoundaryDist(nonEmpty,
        (p - col("y")) / col("n_feat") * lit(1e6)))
    }
    val wFinal = Logistic.trainHashed(feat, nBuckets, 2)
    worst = math.min(worst, minBoundaryDist(nonEmpty,
      Logistic.sigmoid(Logistic.zHashed(wFinal)) * lit(1e6)))
    info(f"p62 min boundary distance = $worst%.3e micro-units")
    assert(worst > FloorMicro,
      s"p62 has a rounding site $worst micro-units from a grid boundary")
  }

  test("p58/x27: every DSIR micro-log rounding site is boundary-safe") {
    val (counts, tTot, rTot) = Dsir.bucketCounts(docs,
      col("source").isin("src0", "src1", "src2"), 256, "text")
    // the exact pre-round doubles microLog quantizes, both smoothed
    // numerators per bucket (absent buckets contribute (1, tot) sites)
    val sites = (0 until 256).flatMap { b =>
      val (t, r) = counts.getOrElse(b, (0L, 0L))
      Seq((math.log((t + 1).toDouble) - math.log(tTot.toDouble)) * 1e6,
        (math.log((r + 1).toDouble) - math.log(rTot.toDouble)) * 1e6)
    }
    val worst = sites.map { v =>
      val a = math.abs(v); math.abs((a - math.floor(a)) - 0.5)
    }.min
    info(f"p58 min boundary distance = $worst%.3e micro-units over ${sites.size} sites")
    assert(worst > FloorMicro,
      s"p58 has a micro-log site $worst micro-units from a grid boundary")
  }
}
