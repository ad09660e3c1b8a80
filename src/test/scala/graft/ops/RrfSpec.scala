package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rank-fusion semantics (p74): the RRF arithmetic on a hand case,
  * the top-L truncation sentinel, and tie determinism.
  */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: fused order, integer contributions, -1 sentinel outside top-L") {
    // list A ranks: 1->d1, 2->d2, 3->d3; list B: 1->d3, 2->d1 (d2
    // absent from B entirely; topL = 2 truncates A to its top 2)
    val a = Seq((1L, 9.0), (2L, 8.0), (3L, 7.0)).toDF("doc_id", "score")
    val b = Seq((3L, 5.0), (1L, 4.0)).toDF("doc_id", "score")
    val out = Rrf.fuseTopN(Seq("a" -> a, "b" -> b), n = 3, topL = 2, rrfK = 60)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("a_rank"),
        r.getAs[Long]("b_rank"), r.getAs[Long]("rrf_micro"), r.getAs[Long]("rank")))
    // contributions: 1e6 DIV 61 = 16393, 1e6 DIV 62 = 16129
    // d1: a1 + b2 = 16393 + 16129 = 32522
    // d3: b1 + (a3 truncated by topL=2) = 16393
    // d2: a2 only = 16129
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, 32522L, 1L),
      (3L, -1L, 1L, 16393L, 2L),
      (2L, 2L, -1L, 16129L, 3L)), s"fused: ${out.toSeq}")
  }

  test("score ties break on ascending id in every list — fusion is deterministic") {
    val tied = Seq((5L, 1.0), (2L, 1.0), (9L, 1.0)).toDF("doc_id", "score")
    val out = Rrf.fuseTopN(Seq("s" -> tied), n = 3)
      .select("doc_id", "s_rank").as[(Long, Long)].collect().toSeq
    assert(out == Seq((2L, 1L), (5L, 2L), (9L, 3L)), s"tie order: $out")
  }
}
