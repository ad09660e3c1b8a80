package graft

import org.apache.spark.sql.functions._

/** Value-quality gate for a6_sketches: the cross-engine check is
  * rows-only by construction (sketch states differ between engines),
  * so this spec pins the sketches to their exact twins (a2/a3) with
  * the algorithms' own error bounds at sf0.01:
  *
  *  - approx_count_distinct: HLL++ with default rsd = 0.05 — the rsd
  *    is the standard error of the estimator, so a 3-sigma band
  *    (15% relative) is the statistically honest gate;
  *  - approx_percentile(accuracy = 10000): rank-error guarantee
  *    eps = 1/accuracy — the returned value's rank is within eps·N of
  *    the target rank, so the value must lie between the exact
  *    percentiles at q ± margin for a small rank margin.
  */
class SketchToleranceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("a6 sketches are within documented error of the exact a2/a3 twins") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        // exact percentiles bracketing the sketch's rank-error band:
        // eps = 1/10000, N per group ~2e4 at sf0.01 => eps*N ~ 2 ranks;
        // q +/- 0.002 spans >= 40 ranks, a comfortable margin
        expr("percentile(l_extendedprice, array(0.498, 0.502, 0.988, 0.992))").as("pc"))
      .select(col("l_returnflag"), col("exact_parts"),
        col("pc")(0).as("med_lo"), col("pc")(1).as("med_hi"),
        col("pc")(2).as("p99_lo"), col("pc")(3).as("p99_hi"))

    val approx = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 10000)").as("pc"))
      .select(col("l_returnflag"), col("approx_parts"),
        col("pc")(0).as("approx_median"), col("pc")(1).as("approx_p99"))

    val rows = exact.join(approx, Seq("l_returnflag")).collect()
    assert(rows.length == 3) // A, N, R

    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val ex = r.getAs[Long]("exact_parts").toDouble
      val ap = r.getAs[Long]("approx_parts").toDouble
      val relErr = math.abs(ap - ex) / ex
      assert(relErr <= 0.15,
        s"$flag: HLL++ distinct $ap vs exact $ex (rel err $relErr > 3*rsd)")

      val med = r.getAs[Double]("approx_median")
      assert(med >= r.getAs[Double]("med_lo") && med <= r.getAs[Double]("med_hi"),
        s"$flag: approx median $med outside exact rank band " +
          s"[${r.getAs[Double]("med_lo")}, ${r.getAs[Double]("med_hi")}]")
      val p99 = r.getAs[Double]("approx_p99")
      assert(p99 >= r.getAs[Double]("p99_lo") && p99 <= r.getAs[Double]("p99_hi"),
        s"$flag: approx p99 $p99 outside exact rank band " +
          s"[${r.getAs[Double]("p99_lo")}, ${r.getAs[Double]("p99_hi")}]")
    }
  }
}
