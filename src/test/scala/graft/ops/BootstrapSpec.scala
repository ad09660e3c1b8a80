package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Poisson-bootstrap semantics (a16): exactness of the integer
  * pipeline, the degenerate-dispersion case, and that the interval
  * actually reflects group dispersion.
  */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("a constant metric yields a zero-width interval equal to the point, exactly") {
    // every resample mean of a constant c is (c·Σw) DIV Σw = c — the
    // integer pipeline makes this EXACT, not approximate
    val docs = (1L to 200L).map(i => (i, "g", 250000L)).toDF("doc_id", "g", "qm")
    val ci = Bootstrap.meanCi(docs, "g", col("qm")).collect().head
    assert(ci.getAs[Long]("point_mean_micro") == 250000L)
    assert(ci.getAs[Long]("ci_lo_micro") == 250000L)
    assert(ci.getAs[Long]("ci_hi_micro") == 250000L)
    assert(ci.getAs[Long]("n_docs") == 200L)
  }

  test("dispersed groups get wider intervals; bounds bracket the point; deterministic") {
    // tight: values on a narrow band; wide: bimodal 0 / 1e6
    val rows = (1L to 200L).map { i =>
      (i, "tight", 500000L + (i % 11) * 100L)
    } ++ (201L to 400L).map { i =>
      (i, "wide", if (i % 2 == 0) 0L else 1000000L)
    }
    val ci = Bootstrap.meanCi(rows.toDF("doc_id", "g", "qm"), "g", col("qm"))
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("point_mean_micro"), r.getAs[Long]("ci_lo_micro"),
          r.getAs[Long]("ci_hi_micro"))).toMap
    val (tp, tl, th) = ci("tight")
    val (wp, wl, wh) = ci("wide")
    assert(tl <= tp && tp <= th, s"tight interval must bracket the point: ($tl, $tp, $th)")
    assert(wl <= wp && wp <= wh, s"wide interval must bracket the point: ($wl, $wp, $wh)")
    assert(wh - wl > 3 * (th - tl),
      s"bimodal dispersion must widen the interval: wide ${wh - wl} vs tight ${th - tl}")
    // deterministic function of the corpus: a re-run is bit-identical
    val again = Bootstrap.meanCi(rows.toDF("doc_id", "g", "qm"), "g", col("qm"))
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("point_mean_micro"), r.getAs[Long]("ci_lo_micro"),
          r.getAs[Long]("ci_hi_micro"))).toMap
    assert(again == ci)
  }

  test("ciRanks derives nearest-rank 2.5/97.5 bounds from b") {
    // b = 64 must keep the historical (2, 63) — the a16 oracle pins it
    assert(Bootstrap.ciRanks(64) == (2, 63))
    assert(Bootstrap.ciRanks(128) == (4, 125))
    assert(Bootstrap.ciRanks(1000) == (25, 975))
    // tiny b: ranks stay inside [1, b]
    assert(Bootstrap.ciRanks(4) == (1, 4))
  }

  test("under-populated groups surface with NULL bounds, never vanish") {
    // a 1-row group: each Poisson(1) resample is empty with
    // probability e^-1 ~ 0.37, so far fewer than 63 of 64 resample
    // means exist — the rank-63 bound CANNOT populate. The group must
    // still appear, point estimate intact, with a null bound.
    val docs = ((1L to 200L).map(i => (i, "big", 250000L)) :+
      ((9999L, "tiny", 700000L))).toDF("doc_id", "g", "qm")
    val rows = Bootstrap.meanCi(docs, "g", col("qm")).collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(rows.keySet == Set("big", "tiny"), "tiny group dropped from output")
    val tiny = rows("tiny")
    assert(tiny.getAs[Long]("point_mean_micro") == 700000L)
    assert(tiny.getAs[Long]("n_docs") == 1L)
    assert(tiny.isNullAt(tiny.fieldIndex("ci_hi_micro")),
      "1-row group cannot populate the rank-63 bound; expected NULL")
  }

  test("medianCi: outlier-robust where the mean is not; constant metric collapses; brackets the point") {
    // 200 rows at 300000 with 8 huge outliers: the MEDIAN interval
    // must stay pinned at 300000 while the mean interval is dragged up
    val rows = ((1L to 200L).map(i => (i, "g", 300000L)) ++
      (201L to 208L).map(i => (i, "g", 100000000L))).toDF("doc_id", "g", "qm")
    val med = Bootstrap.medianCi(rows, "g", col("qm")).collect().head
    assert(med.getAs[Long]("median_micro") == 300000L)
    assert(med.getAs[Long]("ci_lo_micro") == 300000L)
    assert(med.getAs[Long]("ci_hi_micro") == 300000L)
    assert(med.getAs[Long]("n_docs") == 208L)
    val mean = Bootstrap.meanCi(rows, "g", col("qm")).collect().head
    assert(mean.getAs[Long]("point_mean_micro") > 3000000L,
      "the outliers must drag the mean an order of magnitude — that contrast is the point")
    // nearest-rank lower median on an even split picks the LOWER value
    val even = Seq((1L, "h", 10L), (2L, "h", 20L), (3L, "h", 30L), (4L, "h", 40L))
      .toDF("doc_id", "g", "qm")
    val m2 = Bootstrap.medianCi(even, "g", col("qm")).collect().head
    assert(m2.getAs[Long]("median_micro") == 20L,
      s"(n+1) DIV 2 rank of 4 values is the 2nd: ${m2.getAs[Long]("median_micro")}")
    // deterministic
    val again = Bootstrap.medianCi(rows, "g", col("qm")).collect().head
    assert(again.getAs[Long]("ci_lo_micro") == 300000L &&
      again.getAs[Long]("ci_hi_micro") == 300000L)
  }

  test("poisson weights from the hash are unbiased: mean replication ~ 1") {
    val draws = (1L to 2000L).map(i => (i, "g", 1L)).toDF("doc_id", "g", "qm")
      .select(explode(sequence(lit(0), lit(7))).as("b"), col("doc_id"))
      .withColumn("w", Bootstrap.poissonWeight(
        Hashing.hex64(concat_ws("-", col("doc_id").cast("string"),
          col("b").cast("string"), lit("boot"))) % 1000000L))
    val (n, s, mx) = draws.agg(count(lit(1)), sum(col("w")), max(col("w")))
      .as[(Long, Long, Long)].head()
    val mean = s.toDouble / n
    assert(mean > 0.95 && mean < 1.05, s"Poisson(1) mean off: $mean")
    assert(mx <= 9L, s"replication cap exceeded: $mx")
  }
}
