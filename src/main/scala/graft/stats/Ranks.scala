package graft.stats

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Fractional (average) ranking with tie-averaging — the rank used by
  * Spearman correlation.
  *
  * Reference semantics: src/etl_for_all_studies/correlation.py:17-30
  * (`_rankdata`): sort ascending, 1-based ranks, ties get the average of
  * the ranks they span.
  *
  * Spark shape (SURVEY.md §2.6 C1): `row_number` over the partition
  * ordered by value, then `avg(row_number)` over (partition, value) —
  * two window functions, no UDF, fully codegen'd. Both windows share the
  * same partitioning keys so Catalyst plans a single shuffle (one
  * Exchange feeding both Window operators).
  *
  * At scale: the partition is (study, gene) — cardinality bounded by the
  * sample count per gene (10k-50k in the reference envelope), so each
  * window partition fits in memory; the shuffle distributes across
  * genes.
  */
object Ranks {

  /** Adds fractional-rank column `out` of `value` within `partition`. */
  def fractionalRank(df: DataFrame, partition: Seq[Column], value: Column, out: String): DataFrame = {
    val byValue = Window.partitionBy(partition: _*).orderBy(value.asc)
    val tieGroup = Window.partitionBy(partition :+ value: _*)
    df.withColumn("__rn", row_number().over(byValue).cast("double"))
      .withColumn(out, avg(col("__rn")).over(tieGroup))
      .drop("__rn")
  }
}
