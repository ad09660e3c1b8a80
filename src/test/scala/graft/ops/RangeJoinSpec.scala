package graft.ops

import graft.SparkSpec

/** Band join semantics (RangeJoin.scala): inclusive bounds, asymmetric
  * bands, bucket-boundary pairs, key isolation, no duplicate matches.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("band join: inclusive window, cross-bucket pairs found once, keys isolated") {
    val left = Seq(
      (1L, "u1", 100L),
      (2L, "u1", 250L),
      (3L, "u2", 100L)
    ).toDF("lid", "key", "t")
    val right = Seq(
      (10L, "u1", 90L),    // 10 before l1 (in band), 160 before l2 (out)
      (11L, "u1", 150L),   // 50 after l1 (boundary: inclusive), 100 before l2 (out for w=50)
      (12L, "u1", 260L),   // 10 after l2
      (13L, "u2", 140L)    // only matches u2's l3 within 50
    ).toDF("rid", "rkey", "t").withColumnRenamed("rkey", "key")

    val got = RangeJoin.bandJoin(left, right, Seq("key"), "t", "t",
      before = 50L, after = 50L)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 10L), (1L, 11L), (2L, 12L), (3L, 13L)))
  }

  test("band join: asymmetric before/after") {
    val left = Seq((1L, "k", 1000L)).toDF("lid", "key", "t")
    val right = Seq((10L, "k", 994L), (11L, "k", 1003L), (12L, "k", 1010L))
      .toDF("rid", "key", "t")
    // window [t-5, t+3]: 994 out (6 before), 1003 in, 1010 out
    val got = RangeJoin.bandJoin(left, right, Seq("key"), "t", "t",
      before = 5L, after = 3L)
      .select("rid").as[Long].collect().toSeq
    assert(got == Seq(11L))
  }

  test("band join: no duplicates when band spans bucket boundaries") {
    // width = 10; left at 9 explodes into buckets of [−1..1]-ish range;
    // rights dense around the boundary must each appear exactly once
    val left = Seq((1L, "k", 9L)).toDF("lid", "key", "t")
    val right = (0L to 20L).map(t => (100L + t, "k", t)).toDF("rid", "key", "t")
    val got = RangeJoin.bandJoin(left, right, Seq("key"), "t", "t",
      before = 5L, after = 5L)
      .select("rid").as[Long].collect().toSeq
    assert(got.size == got.distinct.size)
    assert(got.sorted == (104L to 114L))
  }
}
