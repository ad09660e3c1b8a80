package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** Structured Streaming over the `events` table shape (event_id, ts,
  * user_id, event_type, value, props).
  *
  * The reference is batch-only by requirement (REQ-014, SURVEY.md §2.9)
  * — this module is the engine's forward extension for incremental
  * study/event arrival: the same transforms as the batch queries,
  * expressed as an unbounded plan. Batch parity matters: a streaming
  * tumbling-window count equals the batch x2_hourly_agg on the same
  * data once the watermark closes.
  *
  * Scale: state is keyed by (window, event_type) / user_id — Spark
  * distributes state by key hash; the watermark bounds state size.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(count: Long, sum: Double, startMs: Long, lastMs: Long)
  case class SessionOut(user_id: Long, n_events: Long, sum_value: Double,
      duration_ms: Long)

  /** Hourly tumbling-window aggregate with a 1-hour watermark — the
    * streaming twin of the batch x2_hourly_agg query.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Session aggregation with explicit state: a user's session closes
    * after `gapMinutes` of inactivity (processing-time timeout), then
    * emits one summary row. mapGroupsWithState is the custom-state
    * primitive (SURVEY.md — KeyValueGroupedDataset state shape).
    *
    * `timeout` defaults to the production processing-time clock; tests
    * pass `NoTimeout` because a wall-clock timeout cannot be driven
    * deterministically from MemoryStream (and keeps the micro-batch
    * loop alive under `processAllAvailable`).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](timeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionOut(userId, s.count, s.sum, s.lastMs - s.startMs)
          } else {
            val evs = rows.toSeq
            val minMs = evs.map(_.ts.getTime).min
            val maxMs = evs.map(_.ts.getTime).max
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, minMs, minMs))
            val next = SessionState(
              prev.count + evs.size, prev.sum + evs.map(_.value).sum,
              math.min(prev.startMs, minMs), math.max(prev.lastMs, maxMs))
            state.update(next)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(s"$gapMinutes minutes")
            SessionOut(userId, next.count, next.sum, next.lastMs - next.startMs)
          }
      }
  }

  /** File-source stream of events parquet with the batch schema. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    spark.readStream.schema(schema).parquet(dir)
  }
}
