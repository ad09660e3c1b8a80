package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** The 100 TB streaming-state path: the HDFS-backed default state store
  * keeps every key in executor heap — session state over billions of
  * users OOMs long before the data is large. RocksDB spills state to
  * local disk with incremental checkpointing and is the production
  * provider for large stateful queries; these specs pin that BOTH
  * stateful shapes this engine ships (windowed agg state and
  * flatMapGroupsWithState custom state) produce identical results on
  * it, and that the provider actually engaged (rocksdb custom metrics
  * in the query progress — a silently ignored conf would pass a
  * results-only test).
  */
class RocksDbStateSpec extends SparkSpec {
  import EventStreams._

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  private def rocksEngaged(q: org.apache.spark.sql.streaming.StreamingQuery): Boolean =
    Option(q.lastProgress).exists(_.stateOperators.exists { op =>
      val it = op.customMetrics.keySet().iterator()
      var found = false
      while (it.hasNext && !found) found = it.next().startsWith("rocksdb")
      found
    })

  test("windowed aggregation state on RocksDB: identical results, provider engaged") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    withRocksDb {
      val source = MemoryStream[Event]
      val events = Seq(
        Event(1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), 1L, "click", 1.0),
        Event(2L, java.sql.Timestamp.valueOf("2026-01-01 10:10:00"), 1L, "click", 2.0),
        Event(3L, java.sql.Timestamp.valueOf("2026-01-01 11:20:00"), 2L, "view", 4.0))
      source.addData(events: _*)
      val q = hourlyCounts(source.toDF())
        .writeStream.format("memory").queryName("rocks_hourly")
        .outputMode(OutputMode.Update()).start()
      try {
        q.processAllAvailable()
        assert(rocksEngaged(q), "no rocksdb custom metrics — default provider ran instead")
        val got = s.table("rocks_hourly")
          .select("event_type", "n_events", "sum_value")
          .as[(String, Long, Double)].collect().toSet
        assert(got == Set(("click", 2L, 3.0), ("view", 1L, 4.0)))
      } finally q.stop()
    }
  }

  test("flatMapGroupsWithState custom state on RocksDB: session machine value-identical") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val gapNs = 30L * 60 * 1000000000L
    val base = 1767225600L * 1000000000L + 1234
    withRocksDb {
      val source = MemoryStream[EventNs]
      val q = sessionizeNs(source.toDS(), gapNs, timeout = GroupStateTimeout.NoTimeout)
        .writeStream.format("memory").queryName("rocks_sessions")
        .outputMode(OutputMode.Append()).start()
      try {
        source.addData(EventNs(1L, base, 7L, 1.0), EventNs(2L, base + 2 * gapNs, 7L, 2.0))
        q.processAllAvailable()
        source.addData(EventNs(3L, base + 4 * gapNs, 7L, 4.0))
        q.processAllAvailable()
        assert(rocksEngaged(q), "no rocksdb custom metrics — default provider ran instead")
        val rows = s.table("rocks_sessions")
          .select("user_id", "session_seq", "n_events", "session_start_us")
          .as[(Long, Long, Long, Long)].collect().toSet
        // same expectations as the default-provider StreamingSpec case:
        // the state store provider must be invisible to the semantics
        assert(rows == Set(
          (7L, 1L, 1L, base / 1000),
          (7L, 2L, 1L, (base + 2 * gapNs) / 1000)))
      } finally q.stop()
    }
  }
}
