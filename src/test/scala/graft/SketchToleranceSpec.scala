package graft

/** The sketch tolerance gate now lives INSIDE a6_sketches: the query
  * emits, per group, the exact twins plus a within-tolerance boolean
  * per estimate (HLL++ gated at 5*rsd = 25% relative — rsd is a
  * standard error not a bound, and 5 sigma makes the probabilistic
  * gate's false-fail odds ~6e-7 per group; approx_percentile
  * gated by a +/-0.02-quantile exact-value window, far wider than its
  * eps = 1/accuracy = 1e-4 rank guarantee). The DuckDB oracle hashes
  * the exact columns and literal TRUE flags, so a sketch regression is
  * driver-visible as a hash mismatch. This spec just runs the query and
  * asserts every flag really is true locally.
  */
class SketchToleranceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("a6_sketches tolerance flags are all true at sf0.01") {
    val rows = SparkEntry.queries("a6_sketches")(spark, sfDir).collect()
    assert(rows.length == 3) // l_returnflag in {A, N, R}
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      Seq("hll_ok", "median_ok", "p99_ok").foreach { c =>
        assert(r.getAs[Boolean](c), s"$flag: $c is false — sketch outside its documented error bound")
      }
    }
  }
}
