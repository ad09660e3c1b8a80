package graft.streaming

import graft.SparkSpec
import graft.ops.Evaluation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** A document scored by both offline models with its event time — the
  * x31 monitor's input row shape.
  */
case class ScoredPair(doc_id: Long, keep_a: Long, keep_b: Long,
    event_ts: java.sql.Timestamp)

/** The monitor family's production claim, MEASURED instead of asserted
  * (round 11): "state is watermark-bounded in production" is only real
  * if a finalized window's state rows actually LEAVE the state store.
  * This spec runs the x31 agreement monitor in its production form —
  * event-time watermark, outputMode(update), RocksDB provider — across
  * multiple micro-batches whose event time advances past the first
  * window, and pins
  *   (1) numRowsRemoved > 0 in StateOperatorProgress (the eviction
  *       actually happened, on the production provider),
  *   (2) the drained update-mode output equals the SAME
  *       windowedAgreementCounts run as one batch over the union of
  *       all inputs (eviction changed state footprint, not results),
  *   (3) kappa from the drained counts equals batch kappa through the
  *       shared kappaFromCounts closed form.
  * The same windowedAgreementCounts definition executes in the x31
  * harness query, so the measurement transfers to the shipped monitor.
  */
class WatermarkEvictionSpec extends SparkSpec {

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

  test("x31 production form: watermark EVICTS finalized window state on RocksDB; drained output == batch") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // batch 1: window [0, 256) — mixed agreement
    val b1 = (0L until 8L).map(i => ScoredPair(i, i % 2, (i + 1) % 2, ts(i * 10)))
    // batch 2: window [768, 1024) — max event 1005 s, so the NEXT
    // batch runs with watermark 1005 − 64 = 941 s > 256 s: window 0's
    // 4 longs must be removed from the state store during batch 3
    val b2 = (0L until 6L).map(i => ScoredPair(100 + i, 1L, 1L, ts(1000 + i)))
    // batch 3: window [1792, 2048) — exists to RUN a batch under the
    // advanced watermark (eviction happens while processing it)
    val b3 = Seq(ScoredPair(200L, 0L, 0L, ts(2000)))
    withRocksDb {
      val source = MemoryStream[ScoredPair]
      val q = Evaluation.windowedAgreementCounts(source.toDF())
        .writeStream.format("memory").queryName("wm_kappa")
        .outputMode("update").start()
      try {
        source.addData(b1: _*); q.processAllAvailable()
        source.addData(b2: _*); q.processAllAvailable()
        source.addData(b3: _*); q.processAllAvailable()
        assert(rocksEngaged(q), "no rocksdb custom metrics — default provider ran instead")
        val removed = q.recentProgress.toSeq
          .flatMap(_.stateOperators.toSeq).map(_.numRowsRemoved).sum
        assert(removed > 0,
          s"watermark passed window 0 but no state rows were removed (sum=$removed)")
        // state now holds strictly fewer rows than windows ever seen
        val lastRows = q.recentProgress.last.stateOperators.head.numRowsTotal
        assert(lastRows < 3,
          s"3 windows were opened but finalized ones must be gone; state holds $lastRows")
        // drained equivalence: latest update per window == the same
        // aggregation over ALL inputs as one bounded frame
        def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long)] =
          df.select(unix_timestamp(col("w.start")).as("ws"), col("n_docs"),
              col("n_agree"), col("n_keep_a"), col("n_keep_b"))
            .as[(Long, Long, Long, Long, Long)].collect().toSet
        val drained = Evaluation.drainLatestWindowCounts(s.table("wm_kappa"))
        val batch = Evaluation.windowedAgreementCounts((b1 ++ b2 ++ b3).toDF())
        assert(canon(drained) == canon(batch),
          s"drained ${canon(drained)} != batch ${canon(batch)}")
        // and the kappa tail agrees through the one shared closed form
        def kap(df: org.apache.spark.sql.DataFrame) =
          Evaluation.kappaFromCounts(
            df.withColumn("window_id", unix_timestamp(col("w.start"))), Seq("window_id"))
            .select("window_id", "n_docs", "n_agree", "kappa")
            .as[(Long, Long, Long, Option[Double])].collect().toSet
        assert(kap(drained) == kap(batch))
      } finally q.stop()
    }
  }
}
