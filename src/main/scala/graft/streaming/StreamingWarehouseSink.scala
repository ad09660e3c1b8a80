package graft.streaming

import graft.etl.JdbcWarehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming → JDBC warehouse with exactly-once delivery.
  *
  * The reference's warehouse loads are batch delete-then-insert
  * (repositories.py:303-309); this is the same contract under
  * Structured Streaming. Spark's JDBC sink has no native streaming
  * support and no transactions across executors, so exactly-once comes
  * from composing two guarantees:
  *
  *  - the checkpointed offset log replays an uncommitted micro-batch
  *    under the SAME `batchId` after any crash;
  *  - [[JdbcWarehouse.replaceBatchAtomic]] stages the executor-parallel
  *    write in `table__stage` (overwritten per batch, so intra-batch
  *    task retries and speculative duplicates cannot reach the live
  *    table) and promotes it in ONE driver-side transaction —
  *    delete batch, insert distinct, commit.
  *
  * Together: at-least-once execution × atomic idempotent per-batch
  * promote = exactly-once table contents, covering both failure
  * classes — whole-batch replay AND a task whose partition write
  * committed before its executor died (the hole a bare
  * delete-then-append leaves open). The batch-id column on the table
  * is the (queryable) price.
  *
  * Scale note: same as the batch JDBC backend — a single JDBC endpoint
  * is the bottleneck, so this sink is for dims/aggregates/alerts-sized
  * streams, not the 100 TB firehose (that lands on the parquet/file
  * sink with its own exactly-once manifest log, [[StreamingEtl]]).
  */
object StreamingWarehouseSink {

  /** Stamp a micro-batch with `batch_id` and a deterministic
    * `row_seq`, exposed so specs can assert the stamped PLAN as well
    * as replay the writer.
    *
    * `row_seq` makes legitimately duplicate rows distinct, so the
    * promote's DISTINCT collapses ONLY task-retry copies — without the
    * stamp, a real duplicate event in a batch would be silently
    * undercounted. The window is PARTITIONED by a full-row hash: only
    * byte-identical rows (plus rare hash collisions) serialize within
    * one task, so the stamp's cost is bounded by duplicate
    * multiplicity, never batch size — no single-task funnel. Ordering
    * by all columns keeps the numbering deterministic across task
    * retries and whole-batch replays: each hash partition's row
    * multiset is deterministic, identical rows are interchangeable
    * under the sort, so the (row, seq) OUTPUT SET is replay-stable
    * even though individual task assignments are not.
    */
  def stampBatch(batch: DataFrame, id: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, hash, row_number}
    val cols = batch.columns.map(col).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(hash(cols: _*)).orderBy(cols: _*)
    batch
      .withColumn("batch_id", lit(id))
      .withColumn("row_seq", row_number().over(w).cast("long"))
  }

  /** The foreachBatch function, exposed for direct replay testing.
    *
    * `stageSuffix` isolates concurrent queries writing one table; a
    * replay of the same query must present the same suffix (derive it
    * from the checkpoint path, as [[ingestAvailable]] does).
    */
  def batchWriter(wh: JdbcWarehouse, table: String,
      stageSuffix: String = ""): (DataFrame, Long) => Unit =
    (batch, id) =>
      wh.replaceBatchAtomic(table, stampBatch(batch, id), id, stageSuffix)

  /** Drain-to-completion ingest of a bounded backlog (AvailableNow),
    * exactly-once into `table`. Restart with the same checkpoint to
    * pick up new source data incrementally.
    */
  def ingestAvailable(rows: DataFrame, wh: JdbcWarehouse, table: String,
      checkpointDir: String): StreamingQuery = {
    // checkpoint-derived stage suffix: stable across replays of THIS
    // query, distinct from any other query's
    val suffix = "_" + java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val q = rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(batchWriter(wh, table, suffix))
      .start()
    q.awaitTermination()
    q
  }
}
