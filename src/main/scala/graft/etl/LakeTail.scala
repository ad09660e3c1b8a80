package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row}

/** Checkpointed INCREMENTAL consumer of a [[SnapshotWarehouse]] table —
  * the tail-the-lake discipline: a training-data pipeline does not
  * re-read 100 TB per day, it processes exactly the commits that
  * landed since its last run.
  *
  * The reference pins the same resume idea one level down: its
  * `etl_study_state` row records how far each study's load got so a
  * re-run continues instead of restarting (reference
  * src/etl_for_all_studies/models.py:124-131, consumed by the
  * pipeline's resume check). Here the offset is a LAKE MANIFEST
  * VERSION, and the incremental read is
  * [[SnapshotWarehouse.appendsBetween]] — exactly the rows commits in
  * `(offset, head]` appended, verified pure-append against the
  * manifests.
  *
  * Delivery semantics — EXACTLY-ONCE for lake-internal sinks, by
  * construction rather than by dedup: the consumer's offset lives in a
  * lake table ([[LakeTail.OffsetsTable]]), and [[runOnce]] hands the
  * batch handler the OPEN TRANSACTION it will commit the offset
  * through. Whatever the handler writes through that transaction
  * (signature state, emitted pairs, encoded codes) publishes in the
  * SAME atomic manifest rename as the offset advance — a crash at any
  * point publishes either everything (batch processed, offset moved)
  * or nothing (batch re-delivered on restart). There is no window
  * where outputs land without the offset or vice versa. (For sinks
  * OUTSIDE the lake the same loop degrades to at-least-once; key the
  * side effect on `toVersion` to make it idempotent.)
  *
  * Non-append history — a takedown ([[SnapshotWarehouse.deleteWhere]]),
  * a partition replace, a compaction — makes "the new rows" ill-defined
  * at segment granularity. The poll DETECTS that from manifest metadata
  * alone and delivers a full-table batch flagged `fullReread = true`:
  * the handler must rebuild its derived state from scratch, never
  * silently double- or under-count (the appendsSince contract,
  * surfaced to the consumer instead of thrown at it).
  *
  * Scale: polling is manifest metadata (no file I/O, no Spark job
  * until a batch actually exists); the offset read is one tiny
  * single-segment table. Each batch plans only the appended segments —
  * O(new data), independent of lake size. Concurrent producers keep
  * appending while a step commits: the consumer's commit touches only
  * its OWN tables, so the OCC disjoint-table rebase
  * ([[SnapshotWarehouse.transact]]) lands it without a retry storm.
  */
final class LakeTail(wh: SnapshotWarehouse, val consumerId: String,
    val table: String) {
  import LakeTail._

  private def spark = wh.sparkSession

  /** PER-CONSUMER offsets table: two consumers tailing the same lake
    * never touch each other's offset table, so their steps are
    * OCC-disjoint and commit concurrently without conflict.
    */
  val offsetsTable: String = s"${OffsetsTable}_$consumerId"

  /** The last manifest version this consumer has fully processed
    * (0 = never ran). Read from the lake's offsets table.
    */
  def lastProcessed(): Long = {
    val m = wh.currentManifest()
    if (!m.tables.contains(offsetsTable)) 0L
    else {
      val r = wh.read(offsetsTable)
        .where(col("consumer") === consumerId && col("table_name") === table)
        .agg(max(col("version"))).head
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
  }

  /** Run one micro-batch if any unconsumed commit exists. `f` receives
    * the open transaction and the batch; the offset advance commits
    * atomically with everything `f` wrote through the transaction.
    * Returns the processed batch, or None when there was nothing to do
    * (no new commits, or only commits that added no rows to `table` —
    * those are skipped without a checkpoint write, so a busy lake
    * whose OTHER tables churn does not make this consumer commit empty
    * manifests).
    */
  def runOnce(f: (SnapshotTxn, TailBatch) => Unit): Option[TailBatch] = {
    val fromV = lastProcessed()
    val toV = wh.currentVersion()
    if (toV <= fromV) return None
    val batch =
      try {
        val added = wh.appendedSegments(table, fromV, toV)
        if (added.isEmpty) return None
        TailBatch(wh.appendsBetween(table, fromV, toV), fromV, toV,
          fullReread = false)
      } catch {
        case _: IllegalStateException =>
          // rewrite inside the window: deliver the full table pinned at
          // toV — the handler rebuilds its derived state
          TailBatch(wh.readAt(table, toV), fromV, toV, fullReread = true)
      }
    wh.transact { txn =>
      f(txn, batch)
      writeOffset(txn, batch.toVersion)
    }
    Some(batch)
  }

  /** Drain every pending commit (bounded by `maxBatches`), returning
    * the batches processed — the microbatch-style loop.
    */
  def drain(f: (SnapshotTxn, TailBatch) => Unit,
      maxBatches: Int = 1000): Seq[TailBatch] = {
    val out = Seq.newBuilder[TailBatch]
    var n = 0
    var more = true
    while (more && n < maxBatches) {
      runOnce(f) match {
        case Some(b) => out += b; n += 1
        case None    => more = false
      }
    }
    out.result()
  }

  /** Replace this consumer's offset row (read-modify-write inside the
    * caller's transaction — the [[Dims]] upsert discipline on a
    * single-row state table).
    */
  private def writeOffset(txn: SnapshotTxn, version: Long): Unit = {
    val prior =
      if (!wh.currentManifest().tables.contains(offsetsTable) &&
        !txn.pendingTables.contains(offsetsTable)) Nil
      else txn.read(offsetsTable)
        .where(!(col("consumer") === consumerId && col("table_name") === table))
        .collect().toSeq
    val rows = prior :+ Row(consumerId, table, version)
    import scala.jdk.CollectionConverters._
    txn.writeDim(offsetsTable,
      spark.createDataFrame(rows.asJava, OffsetsSchema))
  }
}

object LakeTail {
  /** A delivered micro-batch: the rows of commits in
    * `(fromVersion, toVersion]` (or the FULL table at `toVersion` when
    * `fullReread` — the window contained a rewrite).
    */
  final case class TailBatch(df: DataFrame, fromVersion: Long,
      toVersion: Long, fullReread: Boolean)

  /** Prefix of the per-consumer offsets tables
    * (`tail_offsets_<consumerId>`): one row per tailed table, holding
    * the last fully-processed manifest version. Extension tables like
    * any other — snapshot-versioned, vacuumed, time-travelable (an
    * operator can ask "where was the consumer yesterday"), and
    * per-consumer so concurrent consumers' offset commits are
    * OCC-disjoint.
    */
  val OffsetsTable = "tail_offsets"

  val OffsetsSchema: StructType = StructType(Seq(
    StructField("consumer", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("version", LongType, nullable = false)))
}
