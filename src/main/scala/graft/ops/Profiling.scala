package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Column-level data profiling — the first query every pipeline runs
  * against a new drop: per column, row count, null count, distinct
  * count, and min/max rendered as strings so heterogeneous columns
  * share one output schema.
  *
  * One aggregation pass over the table computes every metric (count +
  * per-column count/distinct/min/max); the single wide result row is
  * collected (bounded: 4 metrics × |cols| values — driver metadata,
  * same discipline as dim key maps) and reshaped to one row per
  * column.
  *
  * Scale note: countDistinct columns each add an Expand branch; exact
  * distincts keep the DuckDB oracle byte-matching here, and the
  * documented corpus-scale swap is `approx_count_distinct` (the a6
  * sketch discipline — mergeable partial state, no expand).
  */
object Profiling {

  private val outSchema = StructType(Seq(
    StructField("col_name", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("min_value", StringType, nullable = true),
    StructField("max_value", StringType, nullable = true)))

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head
    val total = r.getAs[Long]("__total")
    val rows = cols.map { c =>
      Row(c, total, total - r.getAs[Long](s"__cnt_$c"),
        r.getAs[Long](s"__nd_$c"),
        r.getAs[String](s"__min_$c"), r.getAs[String](s"__max_$c"))
    }
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows, 1), outSchema)
  }
}
