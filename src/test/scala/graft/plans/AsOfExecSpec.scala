package graft.plans

import graft.SparkSpec
import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

/** The custom as-of physical operator (AsOfJoinPlan → AsOfJoinStrategy
  * → AsOfJoinExec) against the proven union+window formulation: the
  * two must be row-identical on every fixture, the plan must actually
  * contain the custom exec (not a fallback), and the SQL-null edge
  * cases the merge loop special-cases must behave as SQL equality
  * does.
  */
class AsOfExecSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val left = Seq(
      (1L, "u1", 5L), (2L, "u1", 10L), (3L, "u1", 15L), (4L, "u1", 30L),
      (5L, "u2", 50L),            // key with no right rows
      (6L, "u3", 8L), (7L, "u3", 9L)
    ).toDF("id", "key", "t")
    val right = Seq(
      ("u1", 10L, 100.0), ("u1", 20L, 200.0), ("u3", 7L, 300.0)
    ).toDF("key", "t", "rv")
    (left, right)
  }

  test("exec == window formulation on the fixture; plan contains AsOfJoinExec") {
    val (left, right) = fixture
    val viaExec = AsOfJoin.asofMerged(left, right, Seq("key"), "t", Seq("rv"))
    val viaWindow = AsOfJoin.asof(left, right, Seq("key"), "t", Seq("rv"))
    assert(viaExec.columns.toSeq == viaWindow.columns.toSeq)
    val a = viaExec.collect().map(_.toSeq).toSet
    val b = viaWindow.collect().map(_.toSeq).toSet
    assert(a == b, s"exec rows $a != window rows $b")
    val plan = viaExec.queryExecution.executedPlan.toString()
    assert(plan.contains("AsOfJoin"), s"custom exec not planned:\n$plan")
  }

  test("exec: null keys and null times never match, on either side") {
    val left = Seq(
      (1L, Some("u"), Some(10L)),
      (2L, None, Some(10L)),       // null left key: no match
      (3L, Some("u"), None)        // null left time: no match
    ).toDF("id", "key", "t")
    val right = Seq(
      (Some("u"), Some(5L), 1.0),
      (None, Some(1L), 2.0),       // null right key: never a candidate
      (Some("u"), None, 3.0)       // null right time: never a candidate
    ).toDF("key", "t", "rv")
    val got = AsOfJoin.asofMerged(left, right, Seq("key"), "t", Seq("rv"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[java.lang.Double]("rv")).map(_.toDouble)).toMap
    assert(got == Map(1L -> Some(1.0), 2L -> None, 3L -> None))
  }

  test("exec: co-timed right duplicates pick the largest payload, like the window formulation") {
    val left = Seq((1L, "u", 10L)).toDF("id", "key", "t")
    val right = Seq(("u", 10L, 1.0), ("u", 10L, 7.0), ("u", 10L, 3.0))
      .toDF("key", "t", "rv")
    val gotExec = AsOfJoin.asofMerged(left, right, Seq("key"), "t", Seq("rv"))
      .head.getDouble(3)
    val gotWin = AsOfJoin.asof(left, right, Seq("key"), "t", Seq("rv"))
      .head.getDouble(3)
    assert(gotExec == 7.0 && gotWin == 7.0)
  }

  test("exec: multi-column keys and multi-column payload carry row-atomically") {
    val left = Seq((1L, "a", 1L, 20L), (2L, "a", 2L, 20L), (3L, "b", 1L, 20L))
      .toDF("id", "k1", "k2", "t")
    val right = Seq(
      ("a", 1L, 10L, Some(1.0), "x"),
      ("a", 1L, 15L, None, "y"),    // later row with null field still wins atomically
      ("b", 9L, 5L, Some(3.0), "z") // k2 differs: no match for (b,1)
    ).toDF("k1", "k2", "t", "rv", "tag")
    val got = AsOfJoin.asofMerged(left, right, Seq("k1", "k2"), "t",
      Seq("rv", "tag")).collect()
      .map(r => r.getLong(0) -> ((Option(r.getAs[java.lang.Double]("rv")),
        Option(r.getAs[String]("tag"))))).toMap
    assert(got(1L) == ((None, Some("y"))))   // atomic: rv null from the t=15 row
    assert(got(2L) == ((None, None)))        // k2=2 has no right rows at all
    assert(got(3L) == ((None, None)))        // (b,1): right's only b row is k2=9
  }

  test("exec: rejects a non-Long (non-canonical-epoch) time column loudly") {
    val l = Seq((1L, "k", 1.5)).toDF("id", "key", "t")
    val r = Seq(("k", 2.5, 1.0)).toDF("key", "t", "rv")
    assertThrows[IllegalArgumentException](
      AsOfJoin.asofMerged(l, r, Seq("key"), "t", Seq("rv")))
  }
}
