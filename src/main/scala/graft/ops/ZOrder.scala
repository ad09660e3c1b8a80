package graft.ops

import graft.functions.ZValueFn
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Multi-dimensional data-skipping layout (Z-ORDER).
  *
  * A single-column sorted write (s16 / Compaction sortCols) gives
  * parquet-stats skipping on that ONE column; predicates on any other
  * column still read every file. Z-ordering sorts by the Morton
  * interleave of two columns, so each output file covers a compact 2-D
  * tile and min/max stats skip files for range predicates on EITHER
  * dimension — the standard lakehouse layout for tables with two hot
  * filter columns (e.g. events by (user bucket, time bucket)).
  *
  * Inputs are bucket ordinals (non-negative ints — callers pre-bucket
  * continuous values, e.g. a8's literal grid or a fixed time bucket):
  * interleaving raw skewed values would waste interleave bits on empty
  * range; bucketing is the same normalization Delta's Z-ORDER applies
  * via range ids. One range shuffle on the z-value, then an in-file
  * sort — identical cost shape to the single-column sorted compaction.
  */
object ZOrder {

  /** `df` rewritten to `nFiles` z-ordered files at `dir`. */
  def writeZOrdered(df: DataFrame, dir: String, xCol: String, yCol: String,
      nFiles: Int): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    df.withColumn("__z", ZValueFn(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }
}
