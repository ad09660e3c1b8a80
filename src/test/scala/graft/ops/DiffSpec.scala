package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val old = Seq(
      (1L, "a", 10.0), // unchanged
      (2L, "b", 20.0), // changed payload
      (3L, "c", 30.0), // removed
      (5L, "e", Double.NaN) // unchanged incl. NaN (<=> treats NaN = NaN)
    ).toDF("k", "name", "bal")
    val neu = Seq(
      (1L, "a", 10.0),
      (2L, "b", 25.0),
      (4L, "d", 40.0), // added
      (5L, "e", Double.NaN)
    ).toDF("k", "name", "bal")
    val out = Diff.snapshotDiff(old, neu, Seq("k"))
      .select("k", "change_type", "old_bal", "new_bal")
      .as[(Long, String, Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (2L, "changed", Some(20.0), Some(25.0)),
      (3L, "removed", Some(30.0), None),
      (4L, "added", None, Some(40.0))))
  }

  test("snapshotDiff null payloads: null vs value is changed, null vs null is not") {
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "v")
    val neu = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "v")
    val out = Diff.snapshotDiff(old, neu, Seq("k"))
      .select("k", "change_type").as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "changed")))
  }

  test("applyChanges: last change wins, deletes drop, upserts insert absent keys") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val feed = Seq(
      (2L, 1, "U", "b-old"),  // superseded by seq 2
      (2L, 2, "U", "b-new"),
      (3L, 1, "D", ""),       // delete
      (4L, 1, "I", "d"),      // insert
      (5L, 1, "U", "e")       // upsert of an absent key inserts
    ).toDF("k", "seq", "op", "v")
    val out = Diff.applyChanges(base, feed, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "b-new"), (4L, "d"), (5L, "e")))
  }

  test("applyChanges rejects unknown ops loudly") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val feed = Seq((1L, 1, "X", "z")).toDF("k", "seq", "op", "v")
    val e = intercept[Exception] {
      Diff.applyChanges(base, feed, Seq("k"), "seq", "op").collect()
    }
    assert(e.getMessage.contains("op must be I|U|D"))
  }

  test("snapshotDiff restricts comparison to the compare columns when given") {
    val old = Seq((1L, "a", 1)).toDF("k", "v", "noise")
    val neu = Seq((1L, "a", 2)).toDF("k", "v", "noise")
    // noise differs, but only v is compared — no diff row
    assert(Diff.snapshotDiff(old, neu, Seq("k"), compare = Seq("v")).isEmpty)
    // and comparing noise sees it
    assert(Diff.snapshotDiff(old, neu, Seq("k"), compare = Seq("noise"))
      .select("change_type").as[String].collect().toSeq == Seq("changed"))
  }
}
