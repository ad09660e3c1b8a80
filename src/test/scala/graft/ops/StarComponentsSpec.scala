package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Star-contraction connected components (round-3 verdict #7): the
  * chain-shaped graphs that break min-label propagation, plus
  * equivalence with it on graphs both can handle.
  */
class StarComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Number](0).longValue() -> r.getAs[Number](1).longValue()).toMap

  test("100-vertex path graph converges through the DEFAULT API via star auto-route") {
    // 0-1-2-...-99: diameter 99. Min-label propagation moves the label
    // ONE hop per round, so it cannot finish inside its default budget —
    // the default API must detect that at maxIter/2 and route to star
    // contraction instead of throwing (round-4 verdict #7)
    val path = (0L until 99L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val routed = labels(ConnectedComponents.connectedComponents(path))
    assert(routed.size == 100)
    assert(routed.values.forall(_ == 0L), s"non-root labels: ${routed.filter(_._2 != 0L)}")
    // and the explicit star entry point agrees
    val got = labels(ConnectedComponents.connectedComponentsStar(path))
    assert(got == routed)
  }

  test("star contraction ≡ label propagation on near-clique dedup graphs (plus loops/dups/isolated shapes)") {
    // two dup groups + a bridge-free singleton edge + self loop +
    // duplicate edges — the p22-style input shape
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 1L), // triangle with a reversed dup
      (10L, 11L), (11L, 12L),                 // path-3 group
      (20L, 20L),                             // self loop: isolated vertex
      (30L, 31L), (30L, 31L)                  // duplicate edge
    ).toDF("id_a", "id_b")
    val plain = labels(ConnectedComponents.connectedComponents(edges))
    val star = labels(ConnectedComponents.connectedComponentsStar(edges))
    assert(star == plain, s"star=$star plain=$plain")
    assert(star(20L) == 20L) // self-loop vertex is its own component
    assert(star(1L) == 1L && star(3L) == 1L && star(12L) == 10L && star(31L) == 30L)
  }

  test("star contraction ≡ label propagation on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = (1 to 90).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.toDF("id_a", "id_b")
      val plain = labels(ConnectedComponents.connectedComponents(edges, maxIter = 60))
      val star = labels(ConnectedComponents.connectedComponentsStar(edges))
      assert(star == plain, s"trial $trial: star and label propagation disagree")
    }
  }

  test("empty edge list yields empty labels") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(ConnectedComponents.connectedComponentsStar(empty).count() == 0)
  }
}
