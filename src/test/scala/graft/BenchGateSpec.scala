package graft

import org.scalatest.funsuite.AnyFunSuite

/** The gate's name-set contract: a new benched query cannot dodge the
  * per-query regression gate by simply not having a ceiling, and a
  * retired query cannot leave a stale ceiling behind. Pure set
  * algebra — no Spark session — so it runs on every suite pass.
  */
class BenchGateSpec extends AnyFunSuite {

  test("every benched query has a ceiling and every ceiling names a benched query") {
    val benched = SparkEntry.benchQueries.toSet
    val seeded = BenchCeilings.ceilings.keySet
    val unseeded = benched -- seeded
    assert(unseeded.isEmpty,
      s"benched queries with NO ceiling (seed them from a measured min-of-12 " +
        s"at sf0.1 before shipping): ${unseeded.toSeq.sorted.mkString(", ")}")
    val stale = seeded -- benched
    assert(stale.isEmpty,
      s"ceilings for queries that are no longer benched (retire them): " +
        stale.toSeq.sorted.mkString(", "))
  }

  test("ceilings are sane: positive, and none so large it could never gate") {
    BenchCeilings.ceilings.foreach { case (n, c) =>
      assert(c > 0.0, s"$n: non-positive ceiling $c")
      // the most expensive measured query (p66, ~7 s min) seeds ~13 s;
      // anything past 30 s means a typo'd seed that would never fire
      assert(c < 30.0, s"$n: ceiling $c s is implausibly lax — reseed from a measured min")
    }
  }
}
