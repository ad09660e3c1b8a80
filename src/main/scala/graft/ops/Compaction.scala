package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Lake-maintenance compaction — the small-files problem's antidote.
  *
  * Streaming ingest and per-study appends each land many small parquet
  * files; at 100 TB a scan over millions of KB-sized files is
  * scheduler- and NameNode-bound long before it is IO-bound (one task
  * + one open per file). Compaction rewrites a table directory into
  * ~`targetBytes` files sized for `maxPartitionBytes`-friendly scans.
  *
  * Shape: the output file count comes from the OBSERVED byte size
  * (sum of data-file lengths — the parquet-encoded truth, not a row
  * estimate). Without `sortCols` the rewrite is `coalesce` — a
  * shuffle-FREE narrow dependency that only merges read splits.
  * With `sortCols` it is `repartitionByRange + sortWithinPartitions`
  * — one range shuffle that buys s16-style row-group stats skipping
  * on the sorted columns, fusing compaction and layout optimization
  * into the same pass over the data.
  *
  * The swap is the warehouse's recoverable-rename discipline
  * (`ParquetWarehouse.writeDim`): write `__tmp`, set live aside as
  * `__old`, promote, drop. Every crash window leaves either the live
  * or the set-aside copy on disk.
  */
object Compaction {

  /** `requestedFiles` is the byte-derived target (nOut); `filesAfter`
    * is what actually landed — they diverge when range partitions come
    * up empty, and the divergence should be observable.
    */
  final case class CompactionResult(
      filesBefore: Int, filesAfter: Int, bytes: Long, requestedFiles: Int)

  private def dataFiles(fs: FileSystem, dir: HPath): Seq[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(dir).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  def compactParquetDir(spark: SparkSession, dir: String, targetBytes: Long,
      sortCols: Seq[String] = Nil): CompactionResult = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    // normalize FIRST, derive siblings from the normalized path: raw
    // `dir + "__tmp"` on a trailing-slash input would nest the swap
    // dirs INSIDE the live table and the set-aside rename would carry
    // the fresh output away with it
    val live = new HPath(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = live.suffix("__tmp")
    val old = live.suffix("__old")
    // crash recovery (same contract as ParquetWarehouse.read): a death
    // between the two swap renames leaves only the set-aside copy —
    // restore it instead of erroring the table out of existence
    if (!fs.exists(live) && fs.exists(old) && !fs.rename(old, live))
      throw new java.io.IOException(s"Failed to recover $live from $old")
    require(fs.exists(live), s"no table directory at $dir")
    val files = dataFiles(fs, live)
    // a hive-partitioned table (subdirectories) must compact per
    // partition directory — a flat rewrite would silently fold the
    // partition columns into the files and drop the directory pruning
    require(files.nonEmpty,
      s"no data files directly under $dir — for a partitioned table, " +
        "compact each partition directory")
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(live.toString)
    val rewritten =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else if (nOut <= df.rdd.getNumPartitions) df.coalesce(nOut) // merge: shuffle-free
      else df.repartition(nOut) // split: needs the shuffle — coalesce can only merge
    rewritten.write.mode(SaveMode.Overwrite).parquet(tmp.toString)

    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(s"Failed to clear stale $old")
    if (!fs.rename(live, old))
      throw new java.io.IOException(s"Failed to set aside $dir")
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"Failed to promote compacted $tmp")
    fs.delete(old, true)
    CompactionResult(files.size, dataFiles(fs, live).size, bytes, nOut)
  }
}
