package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exactness anatomy of the evaluation family (p72/p73): the rank-sum
  * AUC identity on known orderings, tie-averaging, and the integer
  * calibration lattice.
  */
class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  test("p72: AUC is 1 for a perfect separator, 0 for an inverted one, exactly 1/2 under total ties") {
    val perfect = (1L to 100L).map(i =>
      (i, "g", if (i <= 50) 0.1 + i * 1e-3 else 0.5 + i * 1e-3, if (i <= 50) 0L else 1L))
      .toDF("doc_id", "g", "p_hat", "label")
    val a1 = Evaluation.aucByGroup(perfect, "g").select("auc").as[Double].head()
    assert(a1 == 1.0, s"perfect separator must score AUC 1.0, got $a1")
    val inverted = perfect.withColumn("label", lit(1L) - col("label"))
    val a0 = Evaluation.aucByGroup(inverted, "g").select("auc").as[Double].head()
    assert(a0 == 0.0, s"inverted separator must score AUC 0.0, got $a0")
    // every score identical: tie-averaged ranks make AUC exactly 1/2
    // (the ties-count-half convention) — not approximately
    val ties = (1L to 100L).map(i => (i, "g", 0.5, i % 2))
      .toDF("doc_id", "g", "p_hat", "label")
    val ah = Evaluation.aucByGroup(ties, "g").select("auc").as[Double].head()
    assert(ah == 0.5, s"all-tied scores must give exactly 0.5, got $ah")
  }

  test("p72: hand-computed mixed case with ties; single-class groups yield null") {
    // scores: pos {0.9, 0.7, 0.5}, neg {0.7, 0.3} — pairs: (0.9 beats
    // both) + (0.7 vs 0.3 win, vs 0.7 half) + (0.5 vs 0.3 win, vs 0.7
    // loss) = 4.5 / 6 = 0.75
    val df = Seq(
      (1L, "g", 0.9, 1L), (2L, "g", 0.7, 1L), (3L, "g", 0.5, 1L),
      (4L, "g", 0.7, 0L), (5L, "g", 0.3, 0L),
      (6L, "solo", 0.4, 1L), (7L, "solo", 0.6, 1L))
      .toDF("doc_id", "g", "p_hat", "label")
    val rows = Evaluation.aucByGroup(df, "g").collect()
      .map(r => r.getAs[String]("g") -> Option(r.getAs[java.lang.Double]("auc"))).toMap
    assert(rows("g").contains(0.75), s"hand case must be 0.75: ${rows("g")}")
    assert(rows("solo").isEmpty, "a single-class group has no AUC")
  }

  test("p75: bootstrap point AUC equals the rank-sum AUC on the micro grid") {
    // the w=1 resample's weighted Mann-Whitney must reproduce p72's
    // tie-averaged AUC exactly (same identity, integer form)
    val df = Seq(
      (1L, "g", 0.9, 1L), (2L, "g", 0.7, 1L), (3L, "g", 0.5, 1L),
      (4L, "g", 0.7, 0L), (5L, "g", 0.3, 0L))
      .toDF("doc_id", "g", "p_hat", "label")
    val r = Evaluation.aucBootstrapCi(df, "g").collect().head
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("auc_micro") == 750000L,
      s"hand case is 0.75: ${r.getAs[Long]("auc_micro")}")
  }

  test("p75: CI brackets the point, tightens with n, deterministic; degenerate groups keep null bounds") {
    // larger cohorts must yield narrower AUC intervals around the same
    // generating process (scores carry signal: pos ~ higher)
    def cohort(g: String, n: Int, off: Long): Seq[(Long, String, Double, Long)] =
      (1 to n).map { i =>
        val y = i % 2L
        val s = (if (y == 1L) 0.55 else 0.45) + ((i * 7 + off) % 41 - 20) * 0.01
        (off + i, g, s, y)
      }
    val df = (cohort("small", 60, 1000L) ++ cohort("large", 1500, 2000L))
      .toDF("doc_id", "g", "p_hat", "label")
    val out = Evaluation.aucBootstrapCi(df, "g").collect()
      .map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("auc_micro"), r.getAs[Long]("ci_lo_micro"),
          r.getAs[Long]("ci_hi_micro"))).toMap
    val (sp, sl, sh) = out("small")
    val (lp, ll, lh) = out("large")
    assert(sl <= sp && sp <= sh, s"small interval must bracket: ($sl, $sp, $sh)")
    assert(ll <= lp && lp <= lh, s"large interval must bracket: ($ll, $lp, $lh)")
    assert(lh - ll < sh - sl,
      s"25x the data must tighten the CI: large ${lh - ll} vs small ${sh - sl}")
    val again = Evaluation.aucBootstrapCi(df, "g").collect()
      .map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("auc_micro"), r.getAs[Long]("ci_lo_micro"),
          r.getAs[Long]("ci_hi_micro"))).toMap
    assert(again == out, "bootstrap CI must be a deterministic corpus function")
    // single-positive group: most resamples drop the positive class ->
    // the rank-63 bound cannot populate, but the point row survives
    val deg = ((1L to 40L).map(i => (i, "d", 0.4, 0L)) :+ ((99L, "d", 0.9, 1L)))
      .toDF("doc_id", "g", "p_hat", "label")
    val dr = Evaluation.aucBootstrapCi(deg, "g").collect().head
    assert(dr.getAs[Long]("n_pos") == 1L)
    assert(dr.isNullAt(dr.fieldIndex("ci_hi_micro")),
      "1-positive group cannot populate the rank-63 bound; expected NULL")
  }

  test("p73: bins come from the integer micro grid; means are truncating-exact") {
    val df = Seq(
      (1L, 0.0, 0L), (2L, 0.099999, 0L),   // bin 0
      (3L, 0.1, 0L), (4L, 0.15, 1L),       // bin 1
      (5L, 1.0, 1L))                       // p=1 joins the TOP bin (9)
      .toDF("doc_id", "p_hat", "label")
    val out = Evaluation.calibration(df).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("mean_pred_micro"),
          r.getAs[Long]("frac_pos_micro"))).toMap
    assert(out.keySet == Set(0L, 1L, 9L), s"bins: ${out.keySet}")
    assert(out(0L) == ((2L, 49999L, 0L)))       // (0 + 99999) DIV 2
    assert(out(1L) == ((2L, 125000L, 500000L))) // (100000+150000) DIV 2; 1 of 2 pos
    assert(out(9L) == ((1L, 1000000L, 1000000L)))
  }
}
