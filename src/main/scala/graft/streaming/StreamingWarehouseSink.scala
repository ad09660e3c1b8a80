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
  *  - [[JdbcWarehouse.replaceBatch]] deletes `batch_id = id` before
  *    appending, so a replay — including one racing a partial write
  *    from the crashed attempt — first clears its own leftovers.
  *
  * Together: at-least-once execution × idempotent per-batch write =
  * exactly-once table contents. This is the standard production shape
  * for streaming into a non-transactional sink; the batch-id column on
  * the table is the (queryable) price.
  *
  * Scale note: same as the batch JDBC backend — a single JDBC endpoint
  * is the bottleneck, so this sink is for dims/aggregates/alerts-sized
  * streams, not the 100 TB firehose (that lands on the parquet/file
  * sink with its own exactly-once manifest log, [[StreamingEtl]]).
  */
object StreamingWarehouseSink {

  /** The foreachBatch function, exposed for direct replay testing. */
  def batchWriter(wh: JdbcWarehouse, table: String): (DataFrame, Long) => Unit =
    (batch, id) => wh.replaceBatch(table, batch.withColumn("batch_id", lit(id)), id)

  /** Drain-to-completion ingest of a bounded backlog (AvailableNow),
    * exactly-once into `table`. Restart with the same checkpoint to
    * pick up new source data incrementally.
    */
  def ingestAvailable(rows: DataFrame, wh: JdbcWarehouse, table: String,
      checkpointDir: String): StreamingQuery = {
    val q = rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(batchWriter(wh, table))
      .start()
    q.awaitTermination()
    q
  }
}
