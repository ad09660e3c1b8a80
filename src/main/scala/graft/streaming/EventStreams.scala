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

  /** Nanosecond-precision event for the sessionizer core (the events
    * parquet carries TIMESTAMP(NANOS), read as raw long ns).
    */
  case class EventNs(event_id: Long, ts_ns: Long, user_id: Long, value: Double)

  case class SessionState(seq: Long, count: Long, sum: Double, startNs: Long,
      lastNs: Long)
  case class SessionOut(user_id: Long, n_events: Long, sum_value: Double,
      duration_ms: Long)

  /** Closed-session summary: seq is 1-based per user in event-time
    * order; start/end are microseconds (truncated from ns) — the batch
    * x3_sessionize output shape.
    */
  case class SessionRow(user_id: Long, session_seq: Long, n_events: Long,
      sum_value: Double, session_start_us: Long, session_end_us: Long)

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
    * after `gapMinutes` of inactivity, then emits exactly ONE summary
    * row (Append semantics — no intermediate rows while a session is
    * open). flatMapGroupsWithState is the custom-state primitive
    * (SURVEY.md — KeyValueGroupedDataset state shape).
    *
    * Sessions split on EVENT-time gaps inside the data too: a batch
    * (or replay) carrying events 5 hours apart emits the closed
    * sessions between them — a processing-time timeout alone would
    * merge a whole replayed day into one session. The timeout is only
    * the liveness mechanism that closes the LAST open session when a
    * user goes quiet.
    *
    * `timeout` defaults to the production processing-time clock; tests
    * pass `NoTimeout` because a wall-clock timeout cannot be driven
    * deterministically from MemoryStream (and keeps the micro-batch
    * loop alive under `processAllAvailable`). EventTimeTimeout is
    * rejected: nothing here sets a timeout timestamp, so it would
    * leak state forever.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    val spark = events.sparkSession
    import spark.implicits._
    val ns = events.map(e => EventNs(e.event_id,
      e.ts.getTime * 1000000L + (e.ts.getNanos % 1000000L), e.user_id, e.value))
    sessionizeNs(ns, gapMinutes * 60000000000L, timeout, gapMinutes)
      .map(r => SessionOut(r.user_id, r.n_events, r.sum_value,
        (r.session_end_us - r.session_start_us) / 1000L))
  }

  /** Nanosecond core of [[sessionize]]: identical gap-split state
    * machine over raw ns timestamps (exact against the batch window
    * formulation — no ms truncation can flip a borderline gap), with a
    * per-user session counter carried in state so emitted sessions are
    * numbered 1..k in event-time order exactly like the batch
    * running-sum session id.
    *
    * Ordering contract: events are sorted WITHIN each micro-batch, but
    * the state machine requires event-time order ACROSS batches too —
    * an event older than the carried `state.lastNs` cannot be merged
    * correctly (the session it belongs to may already be closed, and
    * `startNs` is never lowered). Rather than silently produce wrong
    * sessions, such an event fails the query loudly. In practice the
    * contract holds for AvailableNow over a static source (everything
    * arrives in one batch) and for in-order sources; a genuinely
    * out-of-order stream needs a watermark-buffered reorder upstream
    * before this operator.
    */
  def sessionizeNs(events: Dataset[EventNs], gapNs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout,
      timeoutMinutes: Int = 30): Dataset[SessionRow] = {
    require(timeout != GroupStateTimeout.EventTimeTimeout,
      "EventTimeTimeout unsupported: no timeout timestamp is set")
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionRow]
    implicit val longEnc = Encoders.scalaLong
    def emit(userId: Long, s: SessionState): SessionRow =
      SessionRow(userId, s.seq, s.count, s.sum, s.startNs / 1000L, s.lastNs / 1000L)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionRow](
        OutputMode.Append(), timeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(emit(userId, s))
          } else {
            val closed = Seq.newBuilder[SessionRow]
            var cur = state.getOption
            rows.toSeq.sortBy(e => (e.ts_ns, e.event_id)).foreach { e =>
              val t = e.ts_ns
              cur match {
                // batch-internal order is guaranteed by the sort above,
                // so t < lastNs can only mean cross-batch disorder —
                // fail loudly per the ordering contract (Scaladoc)
                case Some(s) if t < s.lastNs =>
                  throw new IllegalStateException(
                    s"sessionizeNs: out-of-order event across micro-batches for " +
                      s"user $userId (ts_ns=$t < state.lastNs=${s.lastNs}); " +
                      "this operator requires event-time order across batches")
                case Some(s) if t - s.lastNs > gapNs =>
                  closed += emit(userId, s)
                  cur = Some(SessionState(s.seq + 1L, 1L, e.value, t, t))
                case Some(s) =>
                  cur = Some(SessionState(s.seq, s.count + 1L, s.sum + e.value,
                    s.startNs, math.max(s.lastNs, t)))
                case None =>
                  cur = Some(SessionState(1L, 1L, e.value, t, t))
              }
            }
            cur.foreach(state.update)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(s"$timeoutMinutes minutes")
            closed.result().iterator
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
