package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Expectation-engine semantics on planted violations: per-row rules
  * count exactly the violating rows (null predicate = violation,
  * fail-closed), uniqueness rules count surplus copies, and the whole
  * report is one aggregation pass over the table.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("p37: planted violations are counted exactly; null predicates fail closed") {
    val df = Seq(
      (Some(1L), Some("alpha"), Some(5L)),
      (Some(2L), Some(""), Some(0L)),        // empty text
      (Some(2L), Some("beta"), Some(4L)),    // duplicate id
      (None, Some("gamma"), Some(5L)),       // null id
      (Some(4L), None, None)                 // null text: len(null) null -> fail closed
    ).toDF("doc_id", "text", "n_chars")
    val got = Expectations.check(df,
      rowRules = Seq(
        "id_not_null" -> col("doc_id").isNotNull,
        "text_nonempty" -> (length(col("text")) > 0),
        "chars_consistent" -> (col("n_chars") === length(col("text")))),
      uniqueRules = Seq("id_unique" -> Seq("doc_id")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("id_not_null") == ((5L, 1L, false)))
    // empty string fails > 0; null text fails closed -> 2 violations
    assert(got("text_nonempty") == ((5L, 2L, false)))
    // row 2 has n_chars=0 = len("")=0 ok; row with nulls fails closed
    assert(got("chars_consistent") == ((5L, 1L, false)))
    // dbt unique semantics: the null-id row is excluded (not_null's
    // business), so surplus = 4 non-null rows - 3 distinct ids = 1,
    // EXACTLY — not >= (a struct-based distinct would count the null
    // key as a value and drift from the SQL count(DISTINCT) oracle)
    assert(got("id_unique") == ((5L, 1L, false)))
    // a clean table passes everything
    val clean = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("doc_id", "text", "n_chars")
    val allPass = Expectations.check(clean,
      rowRules = Seq("id_not_null" -> col("doc_id").isNotNull),
      uniqueRules = Seq("id_unique" -> Seq("doc_id")))
      .collect().forall(_.getBoolean(3))
    assert(allPass)
  }

  test("fkCheck: orphans counted, null FKs excluded, report stacks with check()") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(
      (10L, Option(1L)), (11L, Option(2L)),
      (12L, Option(99L)),          // orphan
      (13L, Option.empty[Long])    // null FK — not_null's business, excluded
    ).toDF("id", "fk")
    val fk = Expectations.fkCheck(child, parent, "child_parent_fk",
      Seq("fk" -> "pk"))
    val row = fk.as[(String, Long, Long, Boolean)].collect().toSeq
    assert(row == Seq(("child_parent_fk", 3L, 1L, false)))
    // same schema as check(): the gate artifact is one stacked frame
    val stacked = Expectations.check(child,
      rowRules = Seq("fk_not_null" -> col("fk").isNotNull))
      .unionByName(fk)
    assert(stacked.count() == 2)
    // a clean child passes; an empty child passes vacuously
    assert(Expectations.fkCheck(child.where(col("fk") <= 2L), parent,
      "clean_fk", Seq("fk" -> "pk")).collect()(0).getBoolean(3))
    assert(Expectations.fkCheck(child.where(lit(false)), parent,
      "empty_fk", Seq("fk" -> "pk")).collect()(0).getBoolean(3))
    assertThrows[IllegalArgumentException](
      Expectations.fkCheck(child, parent, "bad name", Seq("fk" -> "pk")))
  }

  test("x23: streaming monitor accumulates rule state across micro-batches and matches the batch gate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val s = spark
    implicit val sq = s.sqlContext
    val rules = Seq(
      "id_not_null" -> col("doc_id").isNotNull,
      "text_nonempty" -> (length(col("text")) > 0))
    val source = MemoryStream[(Option[Long], String)]
    val batch1 = Seq((Option(1L), "alpha"), (Option(2L), ""))
    val batch2 = Seq((Option.empty[Long], "gamma"), (Option(4L), "delta"))
    val stream = source.toDF().toDF("doc_id", "text")
    val q = Expectations.aggRow(stream, rules)
      .writeStream.format("memory").queryName("x23_state")
      .outputMode(OutputMode.Complete()).start()
    try {
      source.addData(batch1: _*); q.processAllAvailable()
      source.addData(batch2: _*); q.processAllAvailable()
      val streamed = Expectations.reshape(
        s.table("x23_state"), rules.map(_._1))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      // the violation in batch 1 (empty text) and in batch 2 (null id)
      // both survive in the accumulated state — the monitor saw all 4
      val expected = Expectations.check(
        (batch1 ++ batch2).toDF("doc_id", "text"), rules)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      assert(streamed == expected)
      assert(streamed("id_not_null") == ((4L, 1L, false)))
      assert(streamed("text_nonempty") == ((4L, 1L, false)))
    } finally q.stop()
  }

  test("x24: streaming uniqueness monitor matches the batch rule; state is watermark-bounded dedup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val s = spark
    implicit val sq = s.sqlContext
    // (doc_id, event-time seconds): id 2 arrives twice inside the
    // horizon (a violation), id 3 has a null key (excluded, the
    // not_null rule's business), id 1/4 are clean
    val source = MemoryStream[(Option[Long], Long)]
    val rows = Seq(
      (Option(1L), 10L), (Option(2L), 11L), (Option(2L), 12L),
      (Option.empty[Long], 13L), (Option(4L), 14L))
    val stream = source.toDF().toDF("doc_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val surv = Expectations.uniqueSurvivors(stream, Seq("doc_id"), "ts", "10 minutes")
    val q = surv.select("doc_id")
      .writeStream.format("memory").queryName("x24_surv")
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(rows: _*); q.processAllAvailable()
      // the physical plan must carry the WATERMARK-BOUNDED dedup
      // operator — plain dropDuplicates state never expires
      val plan = q.lastProgress.json
      assert(plan.contains("dedupeWithinWatermark"),
        s"expected watermark-bounded dedup in progress:\n$plan")
      val survivors = s.table("x24_surv").count()
      val nonNull = rows.count(_._1.isDefined).toLong
      val report = Expectations.uniqueReportRow(s, "doc_id_unique",
        rows.size.toLong, nonNull, survivors).head()
      assert((report.getString(0), report.getLong(1), report.getLong(2), report.getBoolean(3)) ==
        (("doc_id_unique", 5L, 1L, false)))
      // and it equals the batch rule on the same rows
      val batch = Expectations.check(rows.toDF("doc_id", "sec"), Nil,
        uniqueRules = Seq("doc_id_unique" -> Seq("doc_id"))).head()
      assert((batch.getLong(1), batch.getLong(2), batch.getBoolean(3)) ==
        ((report.getLong(1), report.getLong(2), report.getBoolean(3))))
    } finally q.stop()
  }

  test("p37: non-identifier and duplicate rule names are rejected loudly") {
    val df = Seq((1L, "a")).toDF("id", "t")
    assertThrows[IllegalArgumentException](
      Expectations.check(df, Seq("bad name" -> col("id").isNotNull)))
    assertThrows[IllegalArgumentException](
      Expectations.check(df, Seq("it's" -> col("id").isNotNull)))
    assertThrows[IllegalArgumentException](
      Expectations.check(df, Seq("x" -> col("id").isNotNull,
        "x" -> col("t").isNotNull)))
  }
}
