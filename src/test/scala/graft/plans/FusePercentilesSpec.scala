package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

class FusePercentilesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 1000)
    .map(i => (i % 3, i.toDouble)).toDF("k", "v")

  /** Distinct Percentile aggregate functions in the optimized plan. */
  private def percentileAggs(q: DataFrame): Seq[Percentile] =
    q.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a.aggregateExpressions.flatMap(_.collect {
        case AggregateExpression(p: Percentile, _, _, _, _) => p
      })
    }.flatten.distinct

  test("N separate percentiles over one column fuse into one array buffer") {
    val q = df.groupBy("k").agg(
      expr("percentile(v, 0.25)").as("p25"),
      expr("percentile(v, 0.5)").as("p50"),
      expr("percentile(v, 0.75)").as("p75"),
      expr("percentile(v, 0.99)").as("p99"))
    val aggs = percentileAggs(q)
    assert(aggs.length == 1, s"expected one fused percentile, got $aggs")
    assert(aggs.head.percentageExpression.dataType.typeName.startsWith("array"))
    // values are the exact per-p percentiles
    val rows = q.orderBy("k").collect()
    val expected = df.groupBy("k").agg(
      expr("percentile(v, array(0.25, 0.5, 0.75, 0.99))").as("pc"))
      .orderBy("k").collect()
    rows.zip(expected).foreach { case (got, want) =>
      val arr = want.getSeq[Double](1)
      assert((1 to 4).forall(i => got.getDouble(i) == arr(i - 1)))
    }
  }

  test("fusion applies to raw SQL and leaves non-fusable aggregates alone") {
    df.createOrReplaceTempView("fuse_t")
    try {
      val q = spark.sql(
        """SELECT k, percentile(v, 0.1) AS a, percentile(v, 0.9) AS b,
          |       percentile(v, 0.5) FILTER (WHERE v > 100) AS filtered,
          |       avg(v) AS m
          |FROM fuse_t GROUP BY k""".stripMargin)
      val aggs = percentileAggs(q)
      // 0.1/0.9 fuse; the filtered percentile must NOT join the buffer
      assert(aggs.length == 2)
      assert(aggs.count(_.percentageExpression.dataType.typeName.startsWith("array")) == 1)
      // duplicate percentages collapse to one array slot read twice
      val dup = spark.sql(
        "SELECT percentile(v, 0.5) AS a, percentile(v, 0.5) AS b, " +
          "percentile(v, 0.9) AS c FROM fuse_t")
      assert(percentileAggs(dup).length == 1)
      val r = dup.head
      assert(r.getDouble(0) == r.getDouble(1))
      // a single percentile stays untouched (no pointless array wrap)
      val single = df.groupBy("k").agg(expr("percentile(v, 0.5)"))
      assert(percentileAggs(single).head.percentageExpression.dataType.typeName == "double")
    } finally spark.catalog.dropTempView("fuse_t")
  }

  test("different columns keep separate buffers") {
    val two = df.withColumn("w", col("v") * 2)
    val q = two.groupBy("k").agg(
      expr("percentile(v, 0.25)"), expr("percentile(v, 0.75)"),
      expr("percentile(w, 0.25)"), expr("percentile(w, 0.75)"))
    val aggs = percentileAggs(q)
    assert(aggs.length == 2)
    assert(aggs.forall(_.percentageExpression.dataType.typeName.startsWith("array")))
  }
}
