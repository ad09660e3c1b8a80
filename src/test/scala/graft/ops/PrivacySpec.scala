package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (user, region, tier): region r1/t1 has 3 users, r1/t2 has 1,
  // r2/t1 has 1 — with k=2 the two singleton groups suppress
  private def fixture = Seq(
    (1L, "r1", "t1"), (2L, "r1", "t1"), (3L, "r1", "t1"), (1L, "r1", "t1"),
    (4L, "r1", "t2"),
    (4L, "r2", "t1"), (4L, "r2", "t1")
  ).toDF("user_id", "region", "tier")

  test("kAnonymize publishes no row describing fewer than k individuals") {
    val out = Privacy.kAnonymize(fixture, Seq("region", "tier"), k = 2,
      idCol = "user_id")
      .select("region", "tier", "n_ids", "n_rows")
      .as[(String, String, Long, Long)].collect().toSet
    // kept group intact; both sub-k groups merged into one bucket
    assert(out == Set(
      ("r1", "t1", 3L, 4L),
      ("__suppressed__", "__suppressed__", 1L, 3L)))
    // the bucket's n_ids = 1 because BOTH suppressed groups are the
    // same individual — the union distinct, never the sum (which
    // would claim 2 and overstate the crowd)
  }

  test("kAnonymize: null-keyed sub-k groups reach the bucket (count conservation)") {
    // a null quasi value forms its own group; a null-unsafe membership
    // join would silently drop its individuals from BOTH branches
    val d = Seq(
      (1L, Option("r1")), (2L, Option("r1")), (3L, Option("r1")),
      (4L, Option.empty[String]), (5L, Option.empty[String])
    ).toDF("user_id", "region")
    val out = Privacy.kAnonymize(d, Seq("region"), k = 3, idCol = "user_id")
      .select("region", "n_ids", "n_rows").as[(String, Long, Long)]
      .collect().toSet
    assert(out == Set(("r1", 3L, 3L), ("__suppressed__", 2L, 2L)))
    // conservation: every input row is represented exactly once
    assert(out.toSeq.map(_._3).sum == 5L)
  }

  test("kAnonymize emits no bucket row when nothing is suppressed") {
    val out = Privacy.kAnonymize(fixture, Seq("region", "tier"), k = 1,
      idCol = "user_id")
    assert(out.where(col("region") === "__suppressed__").isEmpty)
    assert(out.count() == 3)
  }

  test("kAnonymize with k above every group suppresses everything into one row") {
    val out = Privacy.kAnonymize(fixture, Seq("region", "tier"), k = 100,
      idCol = "user_id")
      .select("region", "n_ids", "n_rows").as[(String, Long, Long)]
      .collect().toSeq
    assert(out == Seq(("__suppressed__", 4L, 7L)))
  }
}
