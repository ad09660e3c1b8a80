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
  * Spark shape (SURVEY.md §2.6 C1): `rank()` gives the first position
  * of a tie group and a RANGE-frame `count` gives the tie-group size,
  * so `frac = rank + (ties - 1)/2`. Both window functions share ONE
  * window spec (same partition keys, same ordering) — Catalyst plans a
  * single Exchange + single Sort, where the row_number/avg formulation
  * would shuffle twice. Exactly equal to the avg-of-row_number idiom:
  * the average of consecutive integers from `rank` to `rank+ties-1` is
  * rank + (ties-1)/2, and halves are exact in doubles.
  *
  * At scale: one shuffle on the partition keys; per-partition sort
  * bounded by the (study, gene) group size.
  */
object Ranks {

  /** Adds fractional-rank column `out` of `value` within `partition`. */
  def fractionalRank(df: DataFrame, partition: Seq[Column], value: Column, out: String): DataFrame = {
    val byValue = Window.partitionBy(partition: _*).orderBy(value.asc)
    val tieFrame = byValue.rangeBetween(Window.currentRow, Window.currentRow)
    df.withColumn(out,
      rank().over(byValue).cast("double") +
        (count(lit(1)).over(tieFrame).cast("double") - 1.0) / 2.0)
  }
}
