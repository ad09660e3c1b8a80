package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("psi: identical distributions score zero; a planted shift scores positive where it moved") {
    val ref = (1 to 300).map(i => (i % 10) * 10.0 + 1).toDF("value")
    val same = Drift.psiByBin(ref, ref, "value", lo = 0.0, binWidth = 10.0, nBins = 10)
      .select("bin", "psi_contrib").as[(Long, Option[Double])].collect().toMap
    assert(same.size == 10 && same.values.forall(_.contains(0.0)))

    // current loses the top bin's mass to the bottom bin
    val cur = (1 to 300).map { i =>
      val b = i % 10; (if (b == 9) 0 else b) * 10.0 + 1
    }.toDF("value")
    val drift = Drift.psiByBin(ref, cur, "value", 0.0, 10.0, 10)
      .select("bin", "n_ref", "n_cur", "psi_contrib")
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    // bin 0 doubled, bin 9 emptied -> bin 0 contributes positive PSI,
    // bin 9 gates to NULL (one side empty), untouched bins stay 0
    val byBin = drift.map(r => r._1 -> r).toMap
    assert(byBin(0L)._3 == 60L && byBin(0L)._4.exists(_ > 0))
    assert(byBin(9L)._3 == 0L && byBin(9L)._4.isEmpty)
    assert((1L to 8L).forall(b => byBin(b)._4.contains(0.0)))
  }

  test("categorical psi (a19 tail): spine-complete, zero on identical occupancy, positive where mass moved") {
    val spine = Seq(0L, 1L, 2L, 3L).toDF("cell")
    val ref = (1 to 400).map(i => i % 4L).toDF("cell")
    val same = Drift.psiByCategory(ref, ref, "cell", spine)
      .select("cell", "psi_contrib").as[(Long, Option[Double])].collect().toMap
    assert(same.size == 4 && same.values.forall(_.contains(0.0)))
    // mass moves from cell 3 to cell 0; cells 1/2 untouched; a cell
    // absent from BOTH sides still reports (spine-complete)
    val cur = (1 to 400).map(i => if (i % 4L == 3L) 0L else i % 4L).toDF("cell")
    val out = Drift.psiByCategory(ref, cur, "cell", spine)
      .select("cell", "n_ref", "n_cur", "psi_contrib")
      .as[(Long, Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._3 == 200L && out(0L)._4.exists(_ > 0))
    assert(out(3L)._3 == 0L && out(3L)._4.isEmpty, "emptied cell gates to NULL")
    assert(Seq(1L, 2L).forall(c => out(c)._4.contains(0.0)))
    val spine5 = Seq(0L, 1L, 2L, 3L, 9L).toDF("cell")
    val withGhost = Drift.psiByCategory(ref, cur, "cell", spine5).collect()
    assert(withGhost.length == 5, "both-sides-empty category must still report")
  }

  test("a19: identical halves score zero PSI everywhere; a shifted half moves occupancy") {
    // clustered embeddings: two tight direction clusters; reference =
    // balanced, current = all mass in cluster A's direction
    def vec(cluster: Int, i: Int): Seq[Double] = {
      val base = if (cluster == 0) Seq(1.0, 0.0, 0.0, 0.0) else Seq(0.0, 1.0, 0.0, 0.0)
      base.map(_ + (i % 7) * 0.001)
    }
    val emb = (0 until 200).map(i => (i.toLong, vec(i % 2, i)))
      .toDF("vec_id", "embedding")
    val sameHalves = Similarity.embeddingDriftPsi(
      emb.where(col("vec_id") % 2 === 0), emb.where(col("vec_id") % 2 === 0),
      nCentroids = 4)
    assert(sameHalves.select("psi_contrib").as[Option[Double]].collect()
      .forall(v => v.isEmpty || v.contains(0.0)),
      "identical corpora must score zero PSI in every populated cell")
    // current = cluster-0 vectors only: occupancy must collapse into
    // cluster 0's cells and at least one contribution must be non-zero
    val drifted = Similarity.embeddingDriftPsi(
      emb, emb.where(col("vec_id") % 2 === 0), nCentroids = 4).collect()
    val contribs = drifted.flatMap(r =>
      Option(r.getAs[java.lang.Double]("psi_contrib")).map(_.doubleValue))
    assert(contribs.exists(_ > 0.0),
      s"a collapsed current half must show positive PSI somewhere: ${drifted.mkString(";")}")
  }

  test("a20: KS is the exact max CDF gap in count cross products; zero on identical frames; NULL on an empty side") {
    // hand case over a 4-bin grid [0,4): A = {0,1,2,3}, B = {2,3,3,3}
    // cumA = 1,2,3,4; cumB = 0,0,1,4 (nA = nB = 4)
    // gaps (x4 scale): |1*4-0*4|=4, |2*4-0*4|=8, |3*4-1*4|=8, 0
    // -> max 8 at bin 1 (lowest-bin tie-break over bin 2)
    val a = Seq(0.0, 1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 3.2, 3.9).toDF("v")
    val stat = Drift.ksStat(Drift.ksByBin(a, b, "v", lo = 0.0, binWidth = 1.0, nBins = 4))
      .collect().head
    assert(stat.getAs[Long]("n_a") == 4L && stat.getAs[Long]("n_b") == 4L)
    assert(stat.getAs[Long]("ks_bin") == 1L, s"tie must break to the LOWEST bin: $stat")
    // ks = 8/16 = 0.5 exactly
    assert(stat.getAs[Long]("ks_micro") == 500000L, s"got $stat")
    // identical frames: every gap is zero
    val same = Drift.ksStat(Drift.ksByBin(a, a, "v", 0.0, 1.0, 4)).collect().head
    assert(same.getAs[Long]("ks_micro") == 0L)
    // an empty side gates the statistic to NULL, never a fabricated 0
    val empty = Seq.empty[Double].toDF("v")
    val gated = Drift.ksStat(Drift.ksByBin(a, empty, "v", 0.0, 1.0, 4)).collect().head
    assert(gated.isNullAt(gated.fieldIndex("ks_micro")))
    // KS vs PSI division of labor: a localized shift in ONE region
    // moves KS sharply while identical frames keep both at zero —
    // and the statistic is invariant to which side is called A
    val flipped = Drift.ksStat(Drift.ksByBin(b, a, "v", 0.0, 1.0, 4)).collect().head
    assert(flipped.getAs[Long]("ks_micro") == 500000L &&
      flipped.getAs[Long]("ks_bin") == 1L)
  }

  test("x32 tail: per-window KS equals ksStat run per window; identical window scores 0; shifted window moves") {
    // reference: uniform 25/bin over 4 bins; window w1 identical in
    // shares (10/bin), window w2 all mass in bin 0
    val refCounts = Seq((0L, 25L), (1L, 25L), (2L, 25L), (3L, 25L))
      .toDF("bin", "n_ref")
    val cur = (Seq((1L, 0L, 10L), (1L, 1L, 10L), (1L, 2L, 10L), (1L, 3L, 10L)) ++
      Seq((2L, 0L, 40L))).toDF("win_start", "bin", "n_cur")
    val out = Drift.ksAgainstReference(cur, refCounts, nBins = 4)
      .collect().map(r => r.getAs[Long]("win_start") -> r).toMap
    assert(out.size == 2)
    assert(out(1L).getAs[Long]("n_ref") == 100L && out(1L).getAs[Long]("n_cur") == 40L)
    assert(out(1L).getAs[Long]("ks_micro") == 0L &&
      out(1L).getAs[Long]("ks_bin") == 0L, "identical shares -> 0, lowest-bin tie-break")
    // w2: cum_r=25,50,75,100 vs cum_c=40,40,40,40 (tot_r=100, tot_c=40):
    // gaps |25*40-40*100|=3000, 2000, 1000, 0 -> max 3000 at bin 0,
    // ks = 3000e6 DIV 4000 = 750000
    assert(out(2L).getAs[Long]("ks_bin") == 0L &&
      out(2L).getAs[Long]("ks_micro") == 750000L)
    // the twin relationship: each window's row equals ksStat over the
    // same raw frames (the a20 path) — bit-identical, not approximate
    val refRaw = (0 until 4).flatMap(b => Seq.fill(25)(b.toDouble)).toDF("v")
    val w2Raw = Seq.fill(40)(0.0).toDF("v")
    val solo = Drift.ksStat(Drift.ksByBin(refRaw, w2Raw, "v", 0.0, 1.0, 4))
      .collect().head
    assert(solo.getAs[Long]("ks_micro") == out(2L).getAs[Long]("ks_micro") &&
      solo.getAs[Long]("ks_bin") == out(2L).getAs[Long]("ks_bin"))
  }

  test("a21 Mann-Whitney: hand ranks, ties averaged, full separation, empty-side gate") {
    def df(g: String, vs: Seq[Double]) = vs.map((g, _)).toDF("g", "v")
    // interleaved, no ties: U = 3 of 6 -> effect 0.5, z = 0
    val r0 = Drift.mannWhitney(df("g", Seq(1, 3, 5)), df("g", Seq(2, 4)), "v", "g")
      .collect().head
    assert(r0.getAs[Long]("u2_a") == 6L && r0.getAs[Long]("tie_term") == 0L)
    assert(r0.getAs[Long]("effect_micro") == 500000L)
    assert(r0.getAs[Double]("z") == 0.0)
    // full separation: U = n_a*n_b -> effect exactly 1e6
    val r1 = Drift.mannWhitney(df("g", Seq(10, 20, 30)), df("g", Seq(1, 2)), "v", "g")
      .collect().head
    assert(r1.getAs[Long]("u2_a") == 12L)
    assert(r1.getAs[Long]("effect_micro") == 1000000L)
    assert(r1.getAs[Double]("z") == 1.732051)
    // a cross-sample tie: ranks 1, 2.5, 2.5, 4 -> u2 = 1, T = 6,
    // z = (1-4)/(2*sqrt((4/12)*(5 - 6/12))) = -1.224745
    val r2 = Drift.mannWhitney(df("g", Seq(1, 2)), df("g", Seq(2, 3)), "v", "g")
      .collect().head
    assert(r2.getAs[Long]("u2_a") == 1L && r2.getAs[Long]("tie_term") == 6L)
    assert(r2.getAs[Long]("effect_micro") == 125000L)
    assert(r2.getAs[Double]("z") == -1.224745)
    // an empty side: statistic undefined, everything derived is NULL
    val r3 = Drift.mannWhitney(df("g", Seq(1, 2)),
      Seq.empty[(String, Double)].toDF("g", "v"), "v", "g").collect().head
    assert(r3.isNullAt(r3.fieldIndex("u2_a")) &&
      r3.isNullAt(r3.fieldIndex("effect_micro")) && r3.isNullAt(r3.fieldIndex("z")))
  }

  test("psi: out-of-range values clamp to the edge bins; spine reports empty bins") {
    val ref = Seq(-5.0, 2.0, 95.0, 200.0).toDF("value")
    val out = Drift.psiByBin(ref, ref, "value", 0.0, 10.0, 10)
      .select("bin", "n_ref").as[(Long, Long)].collect().toMap
    assert(out(0L) == 2L) // -5 clamps down into bin 0
    assert(out(9L) == 2L) // 95 and 200 clamp up into bin 9
    assert(out.size == 10 && out(5L) == 0L)
  }

  test("windowed psi: reference shares sum to one; novel-bin mass gates to null") {
    val ref = Seq(5.0, 5.0, 15.0, 15.0).toDF("value") // bins 0 and 1, half each
    val shares = Drift.binShares(ref, "value", 0.0, 10.0, 10)
      .as[(Long, Double)].collect().toMap
    assert(shares == Map(0L -> 0.5, 1L -> 0.5))

    val counts = Seq(
      ("w1", 0L, 1L), ("w1", 1L, 1L),  // matches the reference -> psi 0
      ("w2", 0L, 1L), ("w2", 5L, 1L)   // half the mass in a bin ref never saw
    ).toDF("win_start", "bin", "n_cur")
    val scored = Drift.psiAgainstReference(counts,
      Drift.binShares(ref, "value", 0.0, 10.0, 10))
      .select("win_start", "bin", "psi_contrib")
      .as[(String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(scored(("w1", 0L)).contains(0.0) && scored(("w1", 1L)).contains(0.0))
    // w2 bin 0: p_ref 0.5, p_cur 0.5 -> 0; bin 5 unseen in ref -> NULL
    assert(scored(("w2", 0L)).contains(0.0))
    assert(scored(("w2", 5L)).isEmpty)
    // VANISHED mass: ref bin 1 got zero w2 events — the severe drift
    // mode must materialize (n_cur = 0, NULL psi), not silently vanish
    val w2b1 = Drift.psiAgainstReference(counts,
      Drift.binShares(ref, "value", 0.0, 10.0, 10))
      .where(col("win_start") === "w2" && col("bin") === 1)
      .select("n_cur", "psi_contrib").as[(Long, Option[Double])].collect()
    assert(w2b1.toSeq == Seq((0L, None)))
    assert(scored.size == 5) // w1: bins 0,1; w2: bins 0,1,5
  }

  test("heavy hitters: exact top-k with a never-undercounting sketch flag") {
    val rows = (1 to 100).flatMap(i => Seq.fill(i % 7 + 1)(i.toLong)).toDF("user_id")
    val out = Profiling.heavyHitters(rows, "user_id", k = 5)
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == 5)
    // counts are 7 for ids with i%7==6; smallest such ids win the tie
    assert(out.map(_._1).toSeq == Seq(6L, 13L, 20L, 27L, 34L))
    assert(out.forall(r => r._2 == 7L && r._3))
  }

  test("heavy hitters: string keys probe the sketch with the right type") {
    val rows = (1 to 60).map(i => s"u${i % 6}").toDF("k")
    val out = Profiling.heavyHitters(rows, "k", k = 3)
      .as[(String, Long, Boolean)].collect()
    assert(out.map(_._1).toSeq == Seq("u0", "u1", "u2"))
    // the no-undercount contract must hold for non-Long keys too — a
    // Long-typed probe over a string-built sketch silently returns 0
    assert(out.forall(r => r._2 == 10L && r._3))
    intercept[IllegalArgumentException] {
      Profiling.heavyHitters(Seq(1.5).toDF("k"), "k", k = 1)
    }
  }

  test("a21: NULL values are excluded by construction — both engines then agree on every rank") {
    // Spark ranks NULLS FIRST, ANSI engines default NULLS LAST — so a
    // NULL in the value column is dropped, never ranked
    val a = Seq(("g", Some(1.0)), ("g", Some(3.0)), ("g", None), ("g", Some(5.0)))
      .toDF("g", "v")
    val b = Seq(("g", Some(2.0)), ("g", None), ("g", Some(4.0))).toDF("g", "v")
    val withNulls = Drift.mannWhitney(a, b, "v", "g").collect().head
    val without = Drift.mannWhitney(
      a.where(col("v").isNotNull), b.where(col("v").isNotNull), "v", "g")
      .collect().head
    assert(withNulls.getAs[Long]("n_a") == 3L && withNulls.getAs[Long]("n_b") == 2L)
    assert(withNulls.getAs[Long]("u2_a") == without.getAs[Long]("u2_a"))
    assert(withNulls.getAs[Double]("z") == without.getAs[Double]("z"))
  }

  test("a21: integer counts-path rank sum equals the per-row window formulation (order-free exactness pin)") {
    // heavy-tie pooled sample; the doubled rank sum must equal
    // round(sum 2*fractionalRank) computed the old per-row way
    val a = (1 to 2000).map(i => ("g", (i % 7).toDouble)).toDF("g", "v")
    val b = (1 to 1500).map(i => ("g", (i % 11).toDouble)).toDF("g", "v")
    val got = Drift.mannWhitney(a, b, "v", "g").collect().head
    val pooled = a.withColumn("__a", lit(1L)).unionByName(b.withColumn("__a", lit(0L)))
    val perRow = graft.stats.Ranks.fractionalRank(pooled, Seq(col("g")), col("v"), "__r")
      .agg(round(sum(when(col("__a") === 1L, col("__r") * 2.0).otherwise(0.0))).cast("long"))
      .as[Long].collect().head
    assert(got.getAs[Long]("u2_a") == perRow - 2000L * 2001L)
  }

  test("a21 guard: a >= 2e6-row tie group fails LOUD instead of wrapping the tie term") {
    val a = spark.range(1500000L).select(lit("g").as("g"), lit(1.0).as("v"))
    val b = spark.range(600000L).select(lit("g").as("g"), lit(1.0).as("v"))
    val e = intercept[Exception] {
      Drift.mannWhitney(a, b, "v", "g").collect()
    }
    assert(e.getMessage.contains("tie-term envelope"))
  }

  test("a20 guard: n_a*n_b past the 1e6-lift envelope fails LOUD in ksStat") {
    val a = spark.range(3040000L).select((col("id") % 100).cast("double").as("value"))
    val b = spark.range(3040000L).select((col("id") % 100).cast("double").as("value"))
    val e = intercept[Exception] {
      Drift.ksStat(Drift.ksByBin(a, b, "value", 0.0, 10.0, 10)).collect()
    }
    assert(e.getMessage.contains("1e6-lift envelope"))
    // and just inside the envelope the statistic still computes
    val ok = Drift.ksStat(Drift.ksByBin(
      a.limit(1000), b.limit(1000), "value", 0.0, 10.0, 10)).collect().head
    assert(ok.getAs[Long]("ks_micro") == 0L)
  }

  test("a22 TVD: zero on identical frames; disjoint mass scores exactly 1e6; a half shift exactly 5e5; empty side NULL; guard loud") {
    def df(vs: Seq[Double]) = vs.toDF("value")
    def tvd(a: Seq[Double], b: Seq[Double]) =
      Drift.tvdStat(Drift.ksByBin(df(a), df(b), "value", 0.0, 10.0, 10))
        .collect().head
    assert(tvd(Seq(5, 5, 15, 15), Seq(5, 5, 15, 15)).getAs[Long]("tvd_micro") == 0L)
    // fully disjoint bins: ALL mass must move -> exactly 1.0
    assert(tvd(Seq(5, 5, 5, 5), Seq(15, 15, 15, 15)).getAs[Long]("tvd_micro") == 1000000L)
    // a = half bin0 half bin1, b = all bin0: half the mass moves
    assert(tvd(Seq(5, 5, 15, 15), Seq(5, 5, 5, 5)).getAs[Long]("tvd_micro") == 500000L)
    // empty side: undefined, NULL — never a fabricated 0
    val e0 = Drift.tvdStat(Drift.ksByBin(df(Seq(5.0)), df(Seq()), "value", 0.0, 10.0, 10))
      .collect().head
    assert(e0.isNullAt(e0.fieldIndex("tvd_micro")))
    // past the 1e6-lift envelope (4.6e12): loud, not wrapped
    val big1 = spark.range(2150000L).select((col("id") % 100).cast("double").as("value"))
    val big2 = spark.range(2150000L).select((col("id") % 100).cast("double").as("value"))
    val err = intercept[Exception] {
      Drift.tvdStat(Drift.ksByBin(big1, big2, "value", 0.0, 10.0, 10)).collect()
    }
    assert(err.getMessage.contains("1e6-lift envelope"))
  }

  test("x34 tail: per-window TVD equals tvdStat run per window; out-of-range bin fails LOUD") {
    val ref = Seq((0L, 10L), (1L, 10L)).toDF("bin", "n_ref")
    // window 0: identical shares -> 0; window 1: all mass in bin 0 vs
    // ref half-half -> 5e5
    val cur = Seq((0L, 0L, 5L), (0L, 1L, 5L), (1L, 0L, 8L))
      .toDF("win_start", "bin", "n_cur")
    val out = Drift.tvdAgainstReference(cur, ref, nBins = 10)
      .collect().map(r => r.getAs[Long]("win_start") ->
        (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Long]("tvd_micro"))).toMap
    assert(out(0L) == ((20L, 10L, 0L)))
    assert(out(1L) == ((20L, 8L, 500000L)))
    val bad = Seq((0L, 12L, 3L)).toDF("win_start", "bin", "n_cur")
    val e = intercept[Exception] {
      Drift.tvdAgainstReference(bad, ref, nBins = 10).collect()
    }
    assert(e.getMessage.contains("bin out of [0, 10)"))
  }

  test("x32 guard: a current bin outside [0, nBins) fails LOUD instead of silently dropping from the spine join") {
    val ref = Seq((0L, 10L), (1L, 10L)).toDF("bin", "n_ref")
    val bad = Seq((0L, 0L, 5L), (0L, 12L, 3L)).toDF("win_start", "bin", "n_cur")
    val e = intercept[Exception] {
      Drift.ksAgainstReference(bad, ref, nBins = 10).collect()
    }
    assert(e.getMessage.contains("bin out of [0, 10)"))
    // in-range feed is untouched by the guard
    val good = Seq((0L, 0L, 5L), (0L, 1L, 5L)).toDF("win_start", "bin", "n_cur")
    val ok = Drift.ksAgainstReference(good, ref, nBins = 10).collect().head
    assert(ok.getAs[Long]("n_cur") == 10L && ok.getAs[Long]("ks_micro") == 0L)
  }
}
