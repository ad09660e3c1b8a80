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

  /** Low-cardinality variant: identical output, different physical
    * shape. The window formulation sorts each partition in ONE task —
    * with few, huge partitions (e.g. 3 return-flags over 10^9 rows)
    * that is the scan's whole parallelism. When `value` has few
    * distinct values, rank arithmetic only needs per-(partition, value)
    * counts: frac = (rows below) + (ties + 1)/2. The counts table is
    * tiny (|partition| x |distinct values|), its cumulative window is
    * driver-scale work, and the big table gets its ranks by BROADCAST
    * join — fully parallel, no large sort anywhere.
    *
    * Use when distinct(value) per partition is small enough to
    * broadcast (~10^5 rows); the window variant is the general path.
    */
  def fractionalRankLowCard(df: DataFrame, partition: Seq[String], value: Column,
      out: String): DataFrame = {
    val pcols = partition.map(col)
    val withRv = df.withColumn("__rv", value)
    val counts = withRv.groupBy((pcols :+ col("__rv")): _*)
      .agg(count(lit(1)).as("__ties"))
    val cum = Window.partitionBy(pcols: _*).orderBy(col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranks = counts
      .withColumn("__below", coalesce(sum(col("__ties")).over(cum), lit(0L)))
      .select((pcols :+ col("__rv") :+
        (col("__below").cast("double") + (col("__ties").cast("double") + 1.0) / 2.0)
          .as(out)): _*)
    // Null-safe join on the partition keys AND the value so NULL-keyed
    // groups and NULL values both rank exactly like the window variant:
    // partitionBy groups null keys together, and orderBy(asc) puts null
    // values first — which is also where the cumulative window above
    // placed the null-value group, so the arithmetic already agrees.
    val rankSide = ranks.select(
      (partition.map(k => col(k).as(s"__rk_$k")) :+ col("__rv").as("__rrv") :+ col(out)): _*)
    val cond = (partition.map(k => col(k) <=> col(s"__rk_$k")) :+
      (col("__rv") <=> col("__rrv"))).reduce(_ && _)
    withRv.join(broadcast(rankSide), cond)
      .drop((partition.map(k => s"__rk_$k") :+ "__rrv" :+ "__rv"): _*)
  }
}
